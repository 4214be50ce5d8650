"""Training system: jitted train step, config, experiment dirs, metrics."""

from attwarp_tpu.train.config import TrainConfig
from attwarp_tpu.train.experiment import create_experiment_run_dir
from attwarp_tpu.train.metrics import init_metrics
from attwarp_tpu.train.train_step import (
    TrainState,
    create_train_state,
    eval_step,
    make_sharded_train_step,
    train_step,
)

__all__ = [
    "TrainConfig",
    "create_experiment_run_dir",
    "init_metrics",
    "train_loop",
    "TrainState",
    "create_train_state",
    "train_step",
    "eval_step",
    "make_sharded_train_step",
]


def train_loop(*args, **kwargs):
    """Lazy import to keep ``attwarp_tpu.train`` cheap to import."""
    from attwarp_tpu.train.trainer import train_loop as _train_loop

    return _train_loop(*args, **kwargs)

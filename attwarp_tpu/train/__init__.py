"""Training system: jitted train step, config, experiment dirs, metrics."""

from attwarp_tpu.train.config import TrainConfig
from attwarp_tpu.train.train_step import (
    TrainState,
    create_train_state,
    eval_step,
    make_sharded_train_step,
    train_step,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "train_step",
    "eval_step",
    "make_sharded_train_step",
]

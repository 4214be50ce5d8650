"""Model checkpointing with orbax.

Replaces per-epoch ``torch.save`` (trainer.py:660-683) with orbax
checkpoints of the full TrainState (params + optimizer state + step) plus a
JSON sidecar carrying the config — restorable for exact training resume,
which the reference lacks (SURVEY §5: "There is NO mid-epoch training
resume").
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from attwarp_tpu.train.train_step import TrainState


def save_checkpoint(
    save_dir: str | Path, epoch: int, state: TrainState, cfg: Any = None
) -> Path:
    save_dir = Path(save_dir)
    path = (save_dir / f"marginal_net_epoch_{epoch}").absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    if cfg is not None:
        meta = {
            "epoch": epoch,
            "cfg": dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else cfg,
        }
        with open(save_dir / f"marginal_net_epoch_{epoch}.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
    return path


def latest_checkpoint(save_dir: str | Path) -> Optional[Tuple[int, Path]]:
    save_dir = Path(save_dir)
    if not save_dir.exists():
        return None
    best = None
    for d in save_dir.iterdir():
        if d.is_dir() and d.name.startswith("marginal_net_epoch_"):
            try:
                ep = int(d.name.rsplit("_", 1)[-1])
            except ValueError:
                continue
            if best is None or ep > best[0]:
                best = (ep, d)
    return best


def restore_checkpoint(path: str | Path, template: TrainState) -> TrainState:
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).absolute(), jax.device_get(template))
    return TrainState(*restored) if not isinstance(restored, TrainState) else restored

"""MarginalNet training CLI.

Flag parity with ``cli.py:10-58`` plus TPU mesh flags.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence

from attwarp_tpu.train.config import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    d = TrainConfig()
    p = argparse.ArgumentParser("MarginalNet training (FullDataset)")
    p.add_argument("--gqa-root-dir", type=str, default=d.gqa_root_dir)
    p.add_argument("--textvqa-root-dir", type=str, default=d.textvqa_root_dir)
    p.add_argument("--docvqa-root-dir", type=str, default=d.docvqa_root_dir)
    p.add_argument("--num-per-ds", type=int, default=d.num_per_ds)
    p.add_argument("--image-size", type=int, default=d.image_size)

    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--batch-size", type=int, default=d.batch_size)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--wd", type=float, default=d.wd)
    p.add_argument("--workers", type=int, default=d.workers)
    p.add_argument("--cpu", action="store_true")

    p.add_argument("--hidden", type=int, default=d.hidden)
    p.add_argument("--mllm-backend", type=str, default=d.mllm_backend)
    p.add_argument("--mllm-model", type=str, default=d.mllm_model)

    p.add_argument("--experiments-root", type=str, default=d.experiments_root)
    p.add_argument("--vis-every", type=int, default=d.vis_every)
    p.add_argument("--log-every", type=int, default=d.log_every)
    p.add_argument("--seed", type=int, default=d.seed)

    # TPU mesh
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel axis size (default: all devices)")
    p.add_argument("--mesh-model", type=int, default=d.mesh_model,
                   help="tensor-parallel axis size")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoints/ dir of a previous run to resume from")
    p.add_argument("--data-pipeline", type=str, default=d.data_pipeline,
                   choices=("auto", "grain", "thread"),
                   help="input pipeline: grain (worker-ready), thread "
                        "(in-process prefetch), or auto (grain if installed)")
    p.add_argument("--watch-gradients", action="store_true",
                   help="log per-module gradient norms (wandb.watch equivalent)")
    return p


def main(argv: Optional[Sequence[str]] = None) -> int:
    from attwarp_tpu.cli import pin_platform

    pin_platform()
    args = build_parser().parse_args(argv)
    from attwarp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = TrainConfig(
        gqa_root_dir=args.gqa_root_dir,
        textvqa_root_dir=args.textvqa_root_dir,
        docvqa_root_dir=args.docvqa_root_dir,
        num_per_ds=args.num_per_ds,
        image_size=args.image_size,
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        wd=args.wd,
        workers=args.workers,
        cpu=bool(args.cpu),
        hidden=args.hidden,
        mllm_backend=args.mllm_backend,
        mllm_model=args.mllm_model,
        experiments_root=args.experiments_root,
        vis_every=args.vis_every,
        log_every=args.log_every,
        seed=args.seed,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        data_pipeline=args.data_pipeline,
        watch_gradients=bool(args.watch_gradients),
    )
    from attwarp_tpu.train.trainer import train_loop

    train_loop(cfg, resume_from=args.resume)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""MarginalNet training loop.

Structure parity with ``trainer.py:45-701``: seeded 90/10 split, frozen-MLLM
feature extraction outside the optimized step, per-epoch validation with a
once-per-epoch debug round, per-``vis_every`` debug grids + PDF/CDF plots,
per-``log_every`` scalar metrics, per-epoch checkpoints, loss curves.

TPU-native: the fwd+bwd+update step is a single jitted XLA program (bf16
compute, f32 params, no GradScaler); multi-device runs shard the batch over
the ``data`` mesh axis and large weights over ``model``
(attwarp_tpu.parallel); checkpoints are orbax (restorable TrainState, which
the reference's torch.save-per-epoch could not resume exactly).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.data.loader import (
    batch_iterator,
    make_batch_iterator,
    split_indices,
)
from attwarp_tpu.data.manifests import FullDataset
from attwarp_tpu.numerics.cdf import cdf_from_density, gt_marginals
from attwarp_tpu.numerics.pooling import adaptive_avg_pool2d, upsample_pdf_right_inverse
from attwarp_tpu.marginalnet.model import ATTENTION_GRID
from attwarp_tpu.train.checkpoint import save_checkpoint
from attwarp_tpu.train.config import TrainConfig
from attwarp_tpu.train.experiment import create_experiment_run_dir
from attwarp_tpu.train.metrics import init_metrics
from attwarp_tpu.train.train_step import (
    TrainState,
    create_train_state,
    eval_step,
    train_step,
)
from attwarp_tpu.train.viz import (
    plot_axis_cdf_overlay,
    plot_axis_pdf_overlay,
    plot_train_val_curves,
    save_debug_grid,
)


def _seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def prepare_batch(batch: Dict, feats) -> Dict:
    """Attach frozen MLLM features; keep only jit-consumable arrays."""
    img = jnp.asarray(batch["image"], jnp.float32)
    fmap_v = feats.visual_tokens(img)
    ttok, tmask = feats.text_tokens(batch["q_str"])
    return {
        "image": img,
        "attention_map": jnp.asarray(batch["attention_map"], jnp.float32),
        "sqrt_mask": jnp.asarray(batch["sqrt_mask"], jnp.float32),
        "none_mask": jnp.asarray(batch["none_mask"], jnp.float32),
        "fmap_v": fmap_v,
        "ttok": ttok,
        "tmask": tmask,
    }


def _debug_round(
    model, state: TrainState, jbatch: Dict, raw_batch: Dict, out_dir: Path,
    tag: str, step: int, cfg: TrainConfig,
) -> None:
    """Debug grids + PDF/CDF overlays (trainer.py:283-399, 454-631)."""
    try:
        from attwarp_tpu.warp.warp import warp_from_cdf

        from attwarp_tpu.train.train_step import _prepare_attention

        img = jbatch["image"]
        W_img, H_img = img.shape[2], img.shape[1]
        # same per-sample sqrt transform + pool as the training loss, so the
        # plotted GT matches the actual optimization target
        A = _prepare_attention(jbatch)
        px_pred, py_pred = model.apply(
            {"params": state.params}, jbatch["fmap_v"], ATTENTION_GRID,
            jbatch["ttok"], jbatch["tmask"],
        )
        px_img = jnp.clip(upsample_pdf_right_inverse(px_pred, W_img), 0.0, None)
        py_img = jnp.clip(upsample_pdf_right_inverse(py_pred, H_img), 0.0, None)
        Fx = cdf_from_density(px_img)
        Fy = cdf_from_density(py_img)
        Wpred = jnp.clip(warp_from_cdf(img, Fx, Fy), 0.0, 1.0)

        px_gt, py_gt = gt_marginals(A)
        px_gt_img = jnp.clip(upsample_pdf_right_inverse(px_gt, W_img), 0.0, None)
        py_gt_img = jnp.clip(upsample_pdf_right_inverse(py_gt, H_img), 0.0, None)
        Fx_gt = cdf_from_density(px_gt_img)
        Fy_gt = cdf_from_density(py_gt_img)
        Wgt = jnp.clip(warp_from_cdf(img, Fx_gt, Fy_gt), 0.0, 1.0)

        # validation grids get the reference's 5th row: the GT warp from the
        # RAW full-resolution attention map (trainer.py:499-517)
        Wgt_orig = None
        if tag.startswith("val"):
            pxo, pyo = gt_marginals(jbatch["attention_map"])
            Fxo = cdf_from_density(pxo)
            Fyo = cdf_from_density(pyo)
            Wgt_orig = np.asarray(jnp.clip(warp_from_cdf(img, Fxo, Fyo), 0.0, 1.0))

        num_vis = min(4, img.shape[0])
        save_debug_grid(
            np.asarray(img), np.asarray(A), np.asarray(Wpred), np.asarray(Wgt),
            out_dir / f"{tag}_{step:06d}.png",
            questions=raw_batch.get("q_str"),
            num_vis=num_vis,
            warped_gt_orig=Wgt_orig,
        )
        for i in range(num_vis):
            plot_axis_pdf_overlay(
                np.asarray(px_pred[i]), np.asarray(py_pred[i]),
                np.asarray(px_gt[i]), np.asarray(py_gt[i]),
                out_dir / "pdfs" / f"{tag}_{step:06d}_sample{i}.png",
                title_prefix=tag, sample_idx=i,
            )
            plot_axis_cdf_overlay(
                np.asarray(Fx[i]), np.asarray(Fy[i]),
                np.asarray(Fx_gt[i]), np.asarray(Fy_gt[i]),
                out_dir / "cdfs" / f"{tag}_{step:06d}_sample{i}.png",
                title_prefix=f"{tag} (image-res CDF)", sample_idx=i,
            )
    except Exception:
        pass  # debug artifacts must never kill training


def train_loop(
    cfg: Optional[TrainConfig] = None,
    dataset=None,
    feature_extractor=None,
    resume_from: Optional[str] = None,
) -> Path:
    """Train MarginalNet; returns the experiment run directory.

    ``resume_from``: path to a previous run's ``checkpoints/`` directory —
    restores the latest orbax TrainState (params + optimizer + step) and
    continues from the following epoch. (Exact resume; the reference's
    torch.save checkpoints had no resume path at all, SURVEY §5.)"""
    cfg = cfg or TrainConfig()
    _seed_everything(cfg.seed)

    run_dir = create_experiment_run_dir(cfg.experiments_root, cfg)
    save_dir = run_dir / "checkpoints"

    if dataset is None:
        dataset = FullDataset(
            gqa_root_dir=cfg.gqa_root_dir,
            textvqa_root_dir=cfg.textvqa_root_dir,
            docvqa_root_dir=cfg.docvqa_root_dir,
            num_samples_per_dataset=cfg.num_per_ds,
            artifact_type=cfg.artifact_type,
            artifact_layer=cfg.artifact_layer,
            random_seed=cfg.seed,
            image_size=cfg.image_size,
        )
    train_idx, val_idx = split_indices(len(dataset), 0.1, cfg.seed)

    if feature_extractor is None:
        from attwarp_tpu.extract.features import make_feature_extractor

        feature_extractor = make_feature_extractor(cfg)
    feats = feature_extractor

    # probe batch -> init
    probe = next(
        batch_iterator(dataset, train_idx[: cfg.batch_size], cfg.batch_size,
                       drop_last=False)
    )
    jprobe = prepare_batch(probe, feats)
    model, state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed), jprobe)

    start_epoch = 0
    if resume_from:
        from attwarp_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint

        found = latest_checkpoint(resume_from)
        if found is None:
            raise FileNotFoundError(f"No checkpoints under {resume_from}")
        start_epoch, ckpt_path = found
        state = restore_checkpoint(ckpt_path, state)
        print(f"[trainer] resumed from {ckpt_path} (epoch {start_epoch}, "
              f"step {int(state.step)})")

    run = init_metrics(
        run_dir=run_dir,
        project=cfg.wandb_project,
        entity=cfg.wandb_entity,
        cfg={"seed": cfg.seed, "epochs": cfg.epochs, "batch_size": cfg.batch_size,
             "lr": cfg.lr, "wd": cfg.wd, "hidden": cfg.hidden,
             "image_size": cfg.image_size, "w_cdf": cfg.w_cdf},
    )

    # optional multi-device sharding
    mesh = None
    step_fn = lambda s, b: train_step(s, b, model, cfg)
    eval_fn = lambda s, b: eval_step(s, b, model, cfg)
    n_dev = len(jax.devices())
    n_data = cfg.mesh_data or (n_dev // cfg.mesh_model)
    if n_dev > 1 and cfg.batch_size % max(n_data, 1) == 0:
        from attwarp_tpu.parallel import make_mesh
        from attwarp_tpu.train.train_step import make_sharded_train_step

        mesh = make_mesh(n_data=n_data, n_model=cfg.mesh_model)
        sharded_fn, sharded_eval, state, _ = make_sharded_train_step(
            model, cfg, mesh, state, jprobe, with_eval=True
        )
        step_fn = sharded_fn
        eval_fn = sharded_eval
    elif n_dev > 1:
        print(
            f"[trainer] batch_size={cfg.batch_size} not divisible by "
            f"data-axis size {n_data}; running single-device."
        )

    global_step = int(state.step) if resume_from else 0
    train_curve: List[float] = []
    val_curve: List[float] = []

    from attwarp_tpu.utils.profiling import StageTimer

    timer = StageTimer(run_dir / "stages.jsonl")

    for epoch in range(start_epoch, cfg.epochs):
        loss_sum, nb = 0.0, 0
        for raw in make_batch_iterator(
            dataset, train_idx, cfg.batch_size, shuffle=True,
            seed=cfg.seed + epoch, drop_last=True,
            pipeline=cfg.data_pipeline,
        ):
            with timer.stage("features"):
                jbatch = prepare_batch(raw, feats)
                jax.block_until_ready(jbatch)
            with timer.stage("train_step"):
                state, metrics = step_fn(state, jbatch)
                # jit dispatch is async: block so the stage records device
                # time, not dispatch latency (per-step host timing can still
                # under-report sub-100ms programs through the axon relay —
                # see CLAUDE.md; stages.jsonl is for coarse stage ratios,
                # bench.py for real throughput numbers)
                metrics = jax.block_until_ready(metrics)
            global_step += 1
            loss = float(metrics["loss/total"])
            loss_sum += loss
            nb += 1
            if global_step % cfg.log_every == 0:
                payload = {
                    "global_step": global_step,
                    "loss/train_total": loss,
                    "loss/train_pdf": float(metrics["loss/pdf"]),
                    "loss/train_recon_l1": float(metrics["loss/recon_l1"]),
                    "lr": cfg.lr,
                    "grad_norm": float(metrics["grad_norm"]),
                }
                # per-module norms when --watch-gradients (wandb.watch parity)
                payload.update({
                    k: float(v) for k, v in metrics.items()
                    if k.startswith("grad_norm/")
                })
                run.log(payload)
            if global_step % cfg.vis_every == 0:
                _debug_round(model, _host_state(state), jbatch, raw,
                             run_dir / "debug", "train", global_step, cfg)

        # validation
        val_sum, vb = 0.0, 0
        did_debug = False
        for raw in make_batch_iterator(
            dataset, val_idx, cfg.batch_size, shuffle=False, drop_last=False,
            pipeline=cfg.data_pipeline,
        ):
            jbatch = prepare_batch(raw, feats)
            if mesh is not None and jbatch["image"].shape[0] % n_data != 0:
                # last partial val batch: fall back to single-device eval
                m = eval_step(_host_state(state), jbatch, model, cfg)
            else:
                m = eval_fn(state, jbatch)
            val_sum += float(m["loss/total"])
            vb += 1
            if not did_debug:
                _debug_round(model, _host_state(state), jbatch, raw,
                             run_dir / "debug_validation", f"val_{epoch + 1:03d}",
                             global_step, cfg)
                did_debug = True

        train_loss = loss_sum / max(nb, 1)
        val_loss = val_sum / max(vb, 1)
        print(f"Epoch {epoch + 1}: train_loss={train_loss:.4f} | val_loss={val_loss:.4f}")
        train_curve.append(train_loss)
        val_curve.append(val_loss)
        run.log(
            {"epoch": epoch + 1, "loss/train_epoch": train_loss,
             "loss/val_epoch": val_loss},
            step=global_step,
        )
        plot_train_val_curves(train_curve, val_curve, run_dir / "curves" / "loss.png",
                              title="Image-res PDF L1 Loss")
        if (epoch + 1) % cfg.checkpoint_every_epochs == 0:
            save_checkpoint(save_dir, epoch + 1, _host_state(state), cfg)

    print("Training complete. Saved to:", str(run_dir))
    try:
        for name, agg in timer.summary().items():
            run.log({f"stage/{name}_mean_s": agg["mean"],
                     f"stage/{name}_total_s": agg["total"]})
    except Exception:
        pass
    timer.close()
    try:
        run.finish()
    except Exception:
        pass
    return run_dir


def _host_state(state: TrainState) -> TrainState:
    """Sharded or device state -> addressable host state for eval/debug."""
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), state)

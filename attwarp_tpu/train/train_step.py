"""Jit-compiled MarginalNet training step.

Loss semantics match the reference hot loop (trainer.py:162-264):
1. per-sample GQA-bucket transform on the full-res attention (sqrt mask),
2. adaptive-avg-pool to 24×24, sanitize,
3. MarginalNet forward -> (px, py),
4. α-uniform mix with linear decay (trainer.py:212-214),
5. right-inverse upsample of predicted and GT marginals to image resolution,
6. uniform-GT override for 'none'-transform samples (trainer.py:231-238),
7. normalize, loss = w_cdf * (L1(px) + L1(py)); recon_l1 logged.

TPU-native: optax AdamW + global-norm clip replaces torch AMP/GradScaler
(bf16 on TPU needs no loss scaling); the whole step (fwd+bwd+update) is one
XLA program; data parallelism and tensor parallelism come from jit sharding
annotations (see attwarp_tpu.parallel.mesh), with gradient all-reduce over
ICI inserted by the compiler.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from attwarp_tpu.marginalnet.model import ATTENTION_GRID, MarginalNet
from attwarp_tpu.numerics.cdf import gt_marginals
from attwarp_tpu.numerics.losses import recon_l1
from attwarp_tpu.numerics.pooling import adaptive_avg_pool2d, upsample_pdf_right_inverse
from attwarp_tpu.numerics.safe import entropy, mix_with_uniform, normalize_pdf
from attwarp_tpu.train.config import TrainConfig


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(learning_rate=cfg.lr, weight_decay=cfg.wd),
    )


def create_train_state(
    cfg: TrainConfig, rng: jax.Array, sample_batch: Dict[str, jnp.ndarray]
) -> Tuple[MarginalNet, TrainState]:
    """Initialize model params + optimizer state from a probe batch."""
    model = MarginalNet(hidden=cfg.hidden, eps=cfg.eps)
    fmap = sample_batch["fmap_v"][:1]
    ttok = sample_batch["ttok"][:1]
    tmask = sample_batch["tmask"][:1]
    params = model.init(rng, fmap, ATTENTION_GRID, ttok, tmask)["params"]
    opt_state = make_optimizer(cfg).init(params)
    return model, TrainState(jnp.zeros((), jnp.int32), params, opt_state)


def _prepare_attention(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Apply the per-sample sqrt transform mask to full-res attention and
    pool to 24×24 (trainer.py:177-202)."""
    A_full = batch["attention_map"]  # (B, H, W)
    sqrt_mask = batch["sqrt_mask"].reshape(-1, 1, 1)  # (B,1,1) in {0,1}
    A_pos = jnp.clip(A_full, 0.0, None)
    A_full = jnp.sqrt(A_pos) * sqrt_mask + A_pos * (1.0 - sqrt_mask)
    A = adaptive_avg_pool2d(A_full, ATTENTION_GRID)
    A = jnp.nan_to_num(A, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.clip(A, 0.0, None)


def loss_fn(
    params: Any,
    model: MarginalNet,
    batch: Dict[str, jnp.ndarray],
    step: jnp.ndarray,
    cfg: TrainConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    img = jnp.clip(
        jnp.nan_to_num(batch["image"], nan=0.0, posinf=1.0, neginf=0.0), 0.0, 1.0
    )  # (B, H, W, 3)
    A = _prepare_attention(batch)  # (B, 24, 24)
    W_img, H_img = img.shape[2], img.shape[1]

    px_pred, py_pred = model.apply(
        {"params": params}, batch["fmap_v"], ATTENTION_GRID, batch["ttok"], batch["tmask"]
    )

    # α-uniform mix with linear decay (traced step -> jnp.maximum)
    alpha = jnp.maximum(
        cfg.alpha0 * (1.0 - step.astype(jnp.float32) / cfg.alpha_decay_steps), 0.0
    )
    px_s = mix_with_uniform(px_pred, alpha)
    py_s = mix_with_uniform(py_pred, alpha)

    px_img = jnp.clip(upsample_pdf_right_inverse(px_s, W_img), 0.0, None)
    py_img = jnp.clip(upsample_pdf_right_inverse(py_s, H_img), 0.0, None)

    px_gt, py_gt = gt_marginals(A)
    # uniform-GT override for 'none'-transform samples
    none_mask = batch["none_mask"].reshape(-1, 1)  # (B,1) in {0,1}
    px_gt = jnp.where(none_mask > 0, 1.0 / px_gt.shape[-1], px_gt)
    py_gt = jnp.where(none_mask > 0, 1.0 / py_gt.shape[-1], py_gt)

    px_gt_img = jnp.clip(upsample_pdf_right_inverse(px_gt, W_img), 0.0, None)
    py_gt_img = jnp.clip(upsample_pdf_right_inverse(py_gt, H_img), 0.0, None)

    px_img, py_img = normalize_pdf(px_img), normalize_pdf(py_img)
    px_gt_img, py_gt_img = normalize_pdf(px_gt_img), normalize_pdf(py_gt_img)

    L_pdf = jnp.mean(jnp.abs(px_img - px_gt_img)) + jnp.mean(jnp.abs(py_img - py_gt_img))
    L_ent = cfg.ent_weight * (entropy(px_s) + entropy(py_s))
    loss = cfg.w_cdf * L_pdf  # entropy term disabled, as in trainer.py:256

    metrics = {
        "loss/total": loss,
        "loss/pdf": L_pdf,
        "loss/recon_l1": recon_l1(px_s, py_s, A),
        "loss/entropy": L_ent,
        "alpha": alpha,
    }
    return loss, metrics


@partial(jax.jit, static_argnames=("model", "cfg"))
def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model: MarginalNet,
    cfg: TrainConfig,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, model, batch, state.step, cfg
    )
    updates, new_opt = make_optimizer(cfg).update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    if cfg.watch_gradients:
        # per-module gradient norms — the TPU equivalent of the reference's
        # best-effort wandb.watch(net, log="gradients") (trainer.py:146-153);
        # computed inside the jitted step (a few tiny reductions), logged
        # through the metric sink at the trainer's log cadence
        groups = grads.get("params", grads) if isinstance(grads, dict) else grads
        for name, sub in groups.items():
            metrics[f"grad_norm/{name}"] = optax.global_norm(sub)
    return TrainState(state.step + 1, new_params, new_opt), metrics


@partial(jax.jit, static_argnames=("model", "cfg"))
def eval_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model: MarginalNet,
    cfg: TrainConfig,
) -> Dict[str, jnp.ndarray]:
    _, metrics = loss_fn(state.params, model, batch, state.step, cfg)
    return metrics


def make_sharded_train_step(
    model: MarginalNet, cfg: TrainConfig, mesh, state, batch, with_eval: bool = False
):
    """Build a jitted train step with explicit data/model-parallel shardings
    over ``mesh``; returns (fn, sharded_state, sharded_batch), or
    (fn, eval_fn, sharded_state, sharded_batch) when ``with_eval``.

    Batch arrays are sharded on the ``data`` axis, large parameter matrices
    on the ``model`` axis; XLA inserts the gradient psum over ICI.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from attwarp_tpu.parallel.mesh import (
        batch_shardings,
        param_sharding_rules,
        param_shardings,
        replicated,
    )

    p_sh = param_shardings(state.params, mesh)

    def _by_shape(leaf):
        # optimizer moments mirror parameter shapes -> same TP sharding
        spec = param_sharding_rules("", leaf.shape)
        n_model = mesh.shape["model"]
        if "model" in (spec or ()) and leaf.shape[-1] % n_model != 0:
            spec = P(*([None] * leaf.ndim))
        return NamedSharding(mesh, spec)

    opt_sh = jax.tree_util.tree_map(_by_shape, state.opt_state)
    state_sh = TrainState(replicated(mesh), p_sh, opt_sh)
    b_sh = batch_shardings(batch, mesh)

    fn = jax.jit(
        lambda s, b: train_step.__wrapped__(s, b, model, cfg),
        in_shardings=(state_sh, b_sh),
        out_shardings=(state_sh, replicated(mesh)),
    )
    sharded_state = jax.device_put(state, state_sh)
    sharded_batch = jax.device_put(batch, b_sh)
    if with_eval:
        eval_fn = jax.jit(
            lambda s, b: eval_step.__wrapped__(s, b, model, cfg),
            in_shardings=(state_sh, b_sh),
            out_shardings=replicated(mesh),
        )
        return fn, eval_fn, sharded_state, sharded_batch
    return fn, sharded_state, sharded_batch

"""Loss library for MarginalNet training.

Mirrors ``model/marginalnet_full_dataset/losses.py``:
- ``l1_cdf_loss``              (losses.py:11-12)
- ``sym_kl``                   (losses.py:15-22)
- ``separable_recon_loss``     (losses.py:25-33)
- ``recon_l1``                 (losses.py:36-45)
- ``build_axis_cdf_targets``   (losses.py:48-65)
- ``cdf_from_density_downsample`` (losses.py:68-77)

Only the image-resolution PDF L1 (assembled in the trainer) is on the active
training path; the rest are library losses / logged metrics.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from attwarp_tpu.numerics.cdf import cdf_from_density
from attwarp_tpu.numerics.pooling import adaptive_avg_pool1d


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (torch.nn.functional.l1_loss default reduction)."""
    return jnp.mean(jnp.abs(a - b))


def l1_cdf_loss(p_pred: jnp.ndarray, p_gt: jnp.ndarray) -> jnp.ndarray:
    return l1_loss(cdf_from_density(p_pred), cdf_from_density(p_gt))


def sym_kl(p: jnp.ndarray, q: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    p = jnp.clip(p, eps, None)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    q = jnp.clip(q, eps, None)
    q = q / jnp.sum(q, axis=-1, keepdims=True)
    kl_pq = jnp.mean(jnp.sum(p * (jnp.log(p) - jnp.log(q)), axis=-1))
    kl_qp = jnp.mean(jnp.sum(q * (jnp.log(q) - jnp.log(p)), axis=-1))
    return 0.5 * (kl_pq + kl_qp)


def _normalized_outer(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """(B,W),(B,H) -> (B,H,W) separable map, normalized to sum 1 per sample."""
    P = jnp.einsum("bh,bw->bhw", py, px)
    return P / jnp.clip(jnp.sum(P, axis=(-2, -1), keepdims=True), 1e-6, None)


def _normalized_attention(A: jnp.ndarray) -> jnp.ndarray:
    if A.ndim == 4:
        A = jnp.squeeze(A, axis=1)
    Apos = jnp.clip(A, 0.0, None)
    return Apos / jnp.clip(jnp.sum(Apos, axis=(-2, -1), keepdims=True), 1e-6, None)


def separable_recon_loss(px: jnp.ndarray, py: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """MSE between the separable outer-product map and normalized attention."""
    return jnp.mean((_normalized_outer(px, py) - _normalized_attention(A)) ** 2)


def recon_l1(px: jnp.ndarray, py: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """L1 between the separable outer-product map and normalized attention."""
    return jnp.mean(jnp.abs(_normalized_outer(px, py) - _normalized_attention(A)))


def build_axis_cdf_targets(A: jnp.ndarray, L: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``A: (B,1,H,W) -> (Fx, Fy)`` each ``(B, L)``, monotone, ending at 1."""
    A = jnp.nan_to_num(jnp.clip(A.astype(jnp.float32), 0.0, None), nan=0.0, posinf=0.0, neginf=0.0)
    if A.ndim == 4:
        A = jnp.squeeze(A, axis=1)
    mx = jnp.sum(A, axis=-2)
    my = jnp.sum(A, axis=-1)
    mx = mx / jnp.clip(jnp.sum(mx, axis=-1, keepdims=True), 1e-6, None)
    my = my / jnp.clip(jnp.sum(my, axis=-1, keepdims=True), 1e-6, None)
    mx_ds = adaptive_avg_pool1d(mx, L)
    my_ds = adaptive_avg_pool1d(my, L)
    Fx = jnp.cumsum(mx_ds, axis=-1)
    Fy = jnp.cumsum(my_ds, axis=-1)
    Fx = (Fx / jnp.clip(Fx[..., -1:], 1e-6, None)).at[..., -1].set(1.0)
    Fy = (Fy / jnp.clip(Fy[..., -1:], 1e-6, None)).at[..., -1].set(1.0)
    return Fx, Fy


def cdf_from_density_downsample(p: jnp.ndarray, L: int) -> jnp.ndarray:
    """Densities ``(B,N) -> CDF (B,L)`` via pool(pdf) -> cumsum -> renorm."""
    p = jnp.nan_to_num(jnp.clip(p.astype(jnp.float32), 0.0, None), nan=0.0, posinf=0.0, neginf=0.0)
    p = p / jnp.clip(jnp.sum(p, axis=-1, keepdims=True), 1e-6, None)
    p_ds = adaptive_avg_pool1d(p, L)
    F = jnp.cumsum(p_ds, axis=-1)
    F = F / jnp.clip(F[..., -1:], 1e-6, None)
    return F.at[..., -1].set(1.0)

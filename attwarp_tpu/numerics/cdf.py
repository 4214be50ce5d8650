"""CDF/PDF primitives.

Numerically matches the reference implementations in
``model/marginalnet_full_dataset/checkpoint_utils.py``:
- ``cdf_from_density``        (checkpoint_utils.py:30-41)
- ``gt_marginals``            (checkpoint_utils.py:43-51)
- ``_make_strictly_increasing`` (checkpoint_utils.py:17-28)
- ``resample_cdf``            (checkpoint_utils.py:53-62)
- ``_normalize_cdf_1d``       (checkpoint_utils.py:388-399)

All functions are pure jnp, batched over a leading axis, jit/vmap-safe.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _nan_to_num(x: jnp.ndarray, nan: float, posinf: float, neginf: float) -> jnp.ndarray:
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def cdf_from_density(p: jnp.ndarray) -> jnp.ndarray:
    """``p: (B, N)`` densities -> ``(B, N)`` non-decreasing CDF in [0,1], last = 1.

    Clamps to nonnegative, scrubs NaN/Inf, renormalizes, cumsums, pins the
    final entry to exactly 1.0 (reference checkpoint_utils.py:30-41).
    """
    p = _nan_to_num(jnp.clip(p.astype(jnp.float32), 0.0, None), 0.0, 0.0, 0.0)
    denom = jnp.clip(jnp.sum(p, axis=-1, keepdims=True), 1e-6, None)
    p = p / denom
    F = jnp.cumsum(p, axis=-1)
    return F.at[..., -1].set(1.0)


def gt_marginals(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``A: (B, 1, H, W)`` or ``(B, H, W)`` -> normalized marginals
    ``(px: (B, W), py: (B, H))`` (reference checkpoint_utils.py:43-51)."""
    if A.ndim == 4:
        A = jnp.squeeze(A, axis=1)
    Apos = jnp.clip(A, 0.0, None)
    mx = jnp.sum(Apos, axis=-2)  # (B, W): sum over rows
    my = jnp.sum(Apos, axis=-1)  # (B, H): sum over cols
    mx = mx / jnp.clip(jnp.sum(mx, axis=-1, keepdims=True), 1e-6, None)
    my = my / jnp.clip(jnp.sum(my, axis=-1, keepdims=True), 1e-6, None)
    return mx, my


def make_strictly_increasing(F: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Force a batched CDF ``(B, N)`` to be strictly increasing, in [0,1],
    ending at exactly 1 (reference checkpoint_utils.py:17-28).

    Steps: scrub -> running max -> clamp consecutive diffs to >= eps/N ->
    rebuild by cumsum -> renormalize by the (clamped) last value -> clip.
    """
    F = _nan_to_num(F, 0.0, 1.0, 0.0)
    F_nd = jax.lax.cummax(F, axis=F.ndim - 1)
    N = F.shape[-1]
    min_step = eps / max(N, 1)
    d = jnp.clip(F_nd[..., 1:] - F_nd[..., :-1], min_step, None)
    head = F_nd[..., :1]
    F_fix = jnp.concatenate([head, head + jnp.cumsum(d, axis=-1)], axis=-1)
    last = jnp.clip(F_fix[..., -1:], 1e-6, None)
    F_fix = jnp.clip(F_fix / last, 0.0, 1.0)
    return F_fix.at[..., -1].set(1.0)


def resample_cdf(F: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Resize a batched CDF ``(B, N) -> (B, target_len)`` by linear
    interpolation with align_corners=True end-point convention, re-enforcing
    strict monotonicity before and after (reference checkpoint_utils.py:53-62).
    """
    F = make_strictly_increasing(F.astype(jnp.float32))
    N = F.shape[-1]
    if target_len == 1:
        pos = jnp.zeros((1,), dtype=jnp.float32)
    else:
        # align_corners=True: output i samples input at i * (N-1) / (T-1)
        pos = jnp.arange(target_len, dtype=jnp.float32) * (
            float(N - 1) / float(target_len - 1)
        )
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, N - 1)
    hi = jnp.clip(lo + 1, 0, N - 1)
    frac = pos - lo.astype(jnp.float32)
    F_up = F[..., lo] * (1.0 - frac) + F[..., hi] * frac
    return make_strictly_increasing(F_up)


def normalize_cdf_1d(F: jnp.ndarray) -> jnp.ndarray:
    """Make a single CDF ``(N,)`` safe: non-decreasing, in [0,1], last = 1;
    degenerate input falls back to the uniform ramp
    (reference checkpoint_utils.py:388-399)."""
    F = _nan_to_num(F.astype(jnp.float32), 0.0, 1.0, 0.0)
    F = jax.lax.cummax(F, axis=F.ndim - 1)
    last = F[..., -1:]
    N = F.shape[-1]
    uniform = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N, dtype=jnp.float32), F.shape)
    F = jnp.where(last <= 1e-12, uniform, F / jnp.where(last <= 1e-12, 1.0, last))
    return F.at[..., -1].set(1.0)

"""Warp-grid construction: attention -> marginal profiles -> CDF -> inverse map.

Replicates (to float32 tolerance) the two reference code paths:

1. ``warp_image_by_attention`` (new_method.py:198-283): transform + bias the
   attention map, take row/column sums, cumsum/normalize, then invert the
   forward mapping ``[0, cumsum] * new_len`` vs ``[0, 1..N]`` with
   ``np.interp`` to get per-target-pixel source coordinates.
2. ``warp_from_cdf_torch`` (checkpoint_utils.py:133-204): same inversion but
   starting from an externally supplied CDF, with the conditional
   tie-breaking jitter of checkpoint_utils.py:181-184.

The reference runs this math in float64; TPUs are float32-native and the
profile lengths are tiny (<= a few thousand), so float32 stays well inside
the ≤1e-3 pixel-parity budget (verified by golden tests).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from attwarp_tpu.warp.transforms import (
    Transform,
    WarpParams,
    apply_inverse_transform,
    apply_transform,
)

# Constants from new_method.py:194-195.
EPSILON = 1e-9
BASE_ATTENTION = 1e-9


def attention_profiles(
    att_map: jnp.ndarray, params: WarpParams
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Attention map ``(H, W)`` -> marginal profiles and totals.

    Returns ``(profile_x: (W,), profile_y: (H,), total_x: (), total_y: ())``
    including the degenerate-attention fallback of new_method.py:231-239
    (expressed with ``jnp.where`` so it stays jit-safe).
    """
    h, w = att_map.shape[-2], att_map.shape[-1]
    a = jnp.clip(att_map.astype(jnp.float32), 0.0, None)

    if params.transform is Transform.EXP:
        # exp(scale*x) overflows float32 for x*scale > ~88 (the reference
        # works in float64). Compute in log domain: the normalized cumulative
        # profile is invariant to a constant scaling of the profiles, so we
        # shift by the global max before exponentiating; the BASE_ATTENTION
        # bias is scaled by the same factor to preserve exact semantics.
        sx = params.exp_scale * a
        # Shift by the global max BEFORE exponentiating. The shifted
        # exponents are computed to ~1 ulp (the dominant terms have
        # sx - m ~ 0 where float32 is absolutely precise), unlike a
        # logsumexp formulation whose ~255-magnitude logs quantize at
        # ~1.5e-5 absolute and poison the profile by ~1e-5 relative.
        m = jnp.max(sx)
        es = jnp.exp(sx - m)  # underflow of negligible terms is fine
        ls_x = m + jnp.log(jnp.sum(es, axis=-2))  # (W,)
        ls_y = m + jnp.log(jnp.sum(es, axis=-1))  # (H,)
        if params.apply_inverse_to_marginals:
            # inv(sum exp(s*x)/div - B*h) + B*h
            #   = log(max(sum exp(s*x), 1e-9... )) / s + B*h (bias negligible
            # at the magnitudes where stabilization matters; exact in log
            # domain otherwise).
            profile_x = (
                jnp.maximum(ls_x, jnp.log(1e-9)) / params.exp_scale
                + BASE_ATTENTION * h
            )
            profile_y = (
                jnp.maximum(ls_y, jnp.log(1e-9)) / params.exp_scale
                + BASE_ATTENTION * w
            )
            total_x = jnp.sum(profile_x)
            total_y = jnp.sum(profile_y)
            # Inverse-transformed profiles can go negative (log of small
            # values), so the degenerate fallback is reachable here.
            degenerate = jnp.logical_or(total_x < EPSILON, total_y < EPSILON)
            mean_biased = jnp.exp(
                m + jnp.log(jnp.sum(es)) - jnp.log(float(h * w))
            ) / params.exp_divisor + BASE_ATTENTION
            fb_total_x = jnp.maximum(w * (mean_biased * h), EPSILON)
            fb_total_y = jnp.maximum(h * (mean_biased * w), EPSILON)
            profile_x = jnp.where(degenerate, jnp.ones_like(profile_x), profile_x)
            profile_y = jnp.where(degenerate, jnp.ones_like(profile_y), profile_y)
            total_x = jnp.where(degenerate, fb_total_x, total_x)
            total_y = jnp.where(degenerate, fb_total_y, total_y)
            return profile_x, profile_y, total_x, total_y
        # Non-inverse: scaled profiles; normalization cancels the shift.
        scale = jnp.exp(-m)
        div = jnp.asarray(params.exp_divisor, jnp.float32)
        profile_x = jnp.sum(es, axis=-2) / div + (BASE_ATTENTION * h) * scale
        profile_y = jnp.sum(es, axis=-1) / div + (BASE_ATTENTION * w) * scale
        # The per-cell bias makes the (unscaled) totals >= h*w*1e-9 >= EPSILON
        # for any h*w >= 1, so the degenerate fallback is unreachable.
        return profile_x, profile_y, jnp.sum(profile_x), jnp.sum(profile_y)

    a = apply_transform(a, params)
    a_biased = a + BASE_ATTENTION

    profile_x = jnp.sum(a_biased, axis=-2)  # (W,)
    profile_y = jnp.sum(a_biased, axis=-1)  # (H,)

    if params.apply_inverse_to_marginals:
        profile_x = apply_inverse_transform(profile_x - BASE_ATTENTION * h, params)
        profile_y = apply_inverse_transform(profile_y - BASE_ATTENTION * w, params)
        profile_x = profile_x + BASE_ATTENTION * h
        profile_y = profile_y + BASE_ATTENTION * w

    total_x = jnp.sum(profile_x)
    total_y = jnp.sum(profile_y)

    # Degenerate fallback (new_method.py:231-239). With BASE_ATTENTION added
    # per cell this only triggers for pathological inputs, but we keep exact
    # behavioral parity: profiles become ones and the totals become the
    # approximations the reference computes.
    degenerate = jnp.logical_or(total_x < EPSILON, total_y < EPSILON)
    mean_biased = jnp.mean(a_biased)
    fb_total_x = jnp.maximum(w * (mean_biased * h), EPSILON)
    fb_total_y = jnp.maximum(h * (mean_biased * w), EPSILON)
    profile_x = jnp.where(degenerate, jnp.ones_like(profile_x), profile_x)
    profile_y = jnp.where(degenerate, jnp.ones_like(profile_y), profile_y)
    total_x = jnp.where(degenerate, fb_total_x, total_x)
    total_y = jnp.where(degenerate, fb_total_y, total_y)
    return profile_x, profile_y, total_x, total_y


def piecewise_linear_inverse(knots: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Evaluate the inverse of the forward map ``knots[k] -> k`` at integer
    targets ``0..out_len-1``.

    Equivalent to ``np.interp(arange(out_len), knots, arange(n+1))`` for
    monotone knots (verified bit-identical), but fully vectorized as an
    (out_len × n) segment-membership computation. ``jnp.interp`` lowers to a
    searchsorted whose while-loop scalarizes on TPU (~5 ms per batch-128
    grid); this form runs on the VPU in ~0.14 ms.
    """
    n = knots.shape[-1] - 1
    t = jnp.arange(out_len, dtype=jnp.float32)[:, None]  # (T, 1)
    k0 = knots[None, :-1]
    k1 = knots[None, 1:]
    orig0 = jnp.arange(n, dtype=jnp.float32)[None, :]
    inseg = jnp.logical_and(t >= k0, t < k1)  # zero-width segments excluded
    denom = jnp.where(k1 > k0, k1 - k0, 1.0)
    vals = orig0 + (t - k0) / denom
    res = jnp.sum(jnp.where(inseg, vals, 0.0), axis=1)
    cnt = jnp.sum(inseg, axis=1)
    res = res / jnp.maximum(cnt, 1)
    # outside-range clamping, as np.interp
    res = jnp.where(t[:, 0] < knots[0], 0.0, res)
    res = jnp.where(t[:, 0] >= knots[-1], float(n), res)
    return res


def inverse_axis_map(
    profile: jnp.ndarray, total: jnp.ndarray, out_len: int
) -> jnp.ndarray:
    """One axis of the C1 path: profile ``(N,)`` -> source coords ``(out_len,)``.

    Forward knots: ``[0, cumsum(profile)/total] * out_len`` (last forced to
    ``out_len``) against original coordinates ``[0, 1..N]``; the inverse map
    evaluates the piecewise-linear inverse at integer target coordinates
    (new_method.py:241-261).
    """
    cum = jnp.cumsum(profile) / total
    new_knots = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum]) * out_len
    new_knots = new_knots.at[-1].set(float(out_len))
    return piecewise_linear_inverse(new_knots, out_len)


def inverse_axis_map_from_cdf(
    F: jnp.ndarray, out_len: int, tie_jitter: bool = True
) -> jnp.ndarray:
    """One axis of the C4 path: CDF ``(N,)`` in [0,1] -> source coords
    ``(out_len,)`` (checkpoint_utils.py:167-193).

    ``tie_jitter``: if any consecutive forward knots are non-increasing, add
    the reference's linear ramp ``(1e-4 / out_len) * arange`` to the whole
    knot vector before inverting (checkpoint_utils.py:181-184).
    """
    n = F.shape[-1]
    new_knots = jnp.concatenate([jnp.zeros((1,), jnp.float32), F.astype(jnp.float32)])
    new_knots = new_knots * float(out_len)
    new_knots = new_knots.at[-1].set(float(out_len))
    if tie_jitter:
        has_tie = jnp.any(new_knots[1:] - new_knots[:-1] <= 0.0)
        ramp = (1e-4 / max(out_len, 1)) * jnp.arange(n + 1, dtype=jnp.float32)
        new_knots = jnp.where(has_tie, new_knots + ramp, new_knots)
    return piecewise_linear_inverse(new_knots, out_len)

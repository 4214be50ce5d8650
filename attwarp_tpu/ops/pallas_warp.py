"""Fused Pallas warp kernel (int8 fixed-point MXU core).

One grid program per (image, channel): the per-axis inverse maps (computed
outside — they are tiny) are expanded to two-banded interpolation matrices
IN VMEM via iota comparisons, and both separable passes run back-to-back on
the MXU without any intermediate touching HBM.

The resample core is *two-level int8 fixed point*: every operand x with
|x| ≤ 1 is split as ``x ≈ (q_hi + q_lo/254)/127`` (two int8 planes ≈ 15
bits), and each matmul runs as THREE int8×int8 MXU passes with exact int32
accumulation (hi·hi + hi·lo + lo·hi; the dropped lo·lo term is ≤ 2/254² ≈
3e-5 for two-banded rows). The v5e MXU multiplies int8 at twice its bf16
rate, so this outruns both the previous in-kernel 3-pass double-bf16 dot and
XLA's Precision.HIGH einsum pair — measured numbers in ARCHITECTURE.md §4.

Why Pallas and not XLA for the int8 form: XLA materializes each int8
einsum's int32 result in HBM (~6 full-image intermediates per warp), which
erases the MXU gain (measured 15k warps/s vs 86k for the bf16 HIGH pair at
336px/b128 — `warp/resample.py::remap_bilinear_separable_mm_int8` keeps that
prototype). In the kernel all passes accumulate in VMEM; HBM sees one image
read and one image write.

Accuracy: ~6e-5 max deviation from the exact gather path on [0,1]-scaled
pixels (16x inside the ≤1e-3 cv2-parity budget); a per-channel dynamic range
scale handles arbitrary input scales.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_matrix_in_kernel(coords: jnp.ndarray, in_len: int) -> jnp.ndarray:
    """(out_len,) float coords -> (out_len, in_len) two-banded matrix."""
    out_len = coords.shape[0]
    i0 = jnp.floor(coords)
    frac = (coords - i0).astype(jnp.float32)
    i0c = jnp.clip(i0.astype(jnp.int32), 0, in_len - 1)
    i1c = jnp.clip(i0.astype(jnp.int32) + 1, 0, in_len - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_len, in_len), 1)
    return (cols == i0c[:, None]) * (1.0 - frac[:, None]) + (
        cols == i1c[:, None]
    ) * frac[:, None]


# the two-level int8 split is SHARED with the XLA prototype so the kernel's
# numerics can never silently diverge from what the golden test validates
from attwarp_tpu.warp.resample import _quant_pair_unit as _quant_pair


def _dot_int8_pair(a_pair, b_pair) -> jnp.ndarray:
    """``A @ B`` on two-level int8 pairs: three int8 MXU passes, exact int32
    accumulation, f32 result with the operands' [-1, 1] ranges restored."""
    a_hi, a_lo = a_pair
    b_hi, b_lo = b_pair

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.int32)

    main = d(a_hi, b_hi).astype(jnp.float32)
    corr = (d(a_hi, b_lo) + d(a_lo, b_hi)).astype(jnp.float32)
    return (main + corr * (1.0 / 254.0)) * (1.0 / (127.0 * 127.0))


def _warp_kernel(mapx_ref, mapy_ref, img_ref, out_ref):
    # mapx: (1, 1, W_out); mapy: (1, 1, H_out); img: (1, 1, H, W) one channel
    H, W = img_ref.shape[2], img_ref.shape[3]
    Rx = _interp_matrix_in_kernel(mapx_ref[0, 0, :], W)   # (W_out, W)
    Ry = _interp_matrix_in_kernel(mapy_ref[0, 0, :], H)   # (H_out, H)
    img = img_ref[0, 0]
    # per-channel dynamic range scale (≈1 for [0,1] pixels, 255 for uint8)
    m = jnp.maximum(jnp.max(jnp.abs(img)), 1e-12)
    x = _quant_pair(img * (1.0 / m))
    rx = _quant_pair(Rx.T)          # (W, W_out); rows of Rx sum to 1
    ry = _quant_pair(Ry)
    t = _dot_int8_pair(x, rx)       # (H, W_out) in [-1-eps, 1+eps]
    out = _dot_int8_pair(ry, _quant_pair(t))
    out_ref[0, 0] = out * m


@partial(jax.jit, static_argnames=("interpret",))
def warp_batch_pallas_cf(
    images_cf: jnp.ndarray,  # (B, C, H, W) float32
    map_x: jnp.ndarray,      # (B, W_out) source x coords
    map_y: jnp.ndarray,      # (B, H_out) source y coords
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused separable bilinear warp; returns (B, C, H_out, W_out).

    Grid (B, C): one channel per program keeps the VMEM working set at
    ~4·H·W bytes + matrices, so 672px images fit comfortably (the whole-
    image variant hit the ~16 MB VMEM ceiling there)."""
    B, C, H, W = images_cf.shape
    W_out = map_x.shape[1]
    H_out = map_y.shape[1]
    # 3 int8 passes per matmul at 2 ops/flop-equivalent ~ flops for scheduling
    flops = 2 * 2 * H * W * max(W_out, H_out) * 3
    return pl.pallas_call(
        _warp_kernel,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 1, W_out), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H_out), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H_out, W_out), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, H_out, W_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * C * flops,
            bytes_accessed=4 * B * C * (H * W + H_out * W_out),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        map_x.astype(jnp.float32)[:, None, :],
        map_y.astype(jnp.float32)[:, None, :],
        images_cf.astype(jnp.float32),
    )


@partial(
    jax.jit,
    static_argnames=("new_width", "new_height", "params", "interpret"),
)
def warp_batch_by_attention_pallas(
    images: jnp.ndarray,    # (B, H, W, C) channels-last, float
    att_maps: jnp.ndarray,  # (B, h, w)
    new_width: int,
    new_height: int,
    params=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full fused pipeline with the Pallas resample core; channels-last
    in/out to match ``warp_batch_by_attention``."""
    from attwarp_tpu.warp.grid import attention_profiles, inverse_axis_map
    from attwarp_tpu.warp.transforms import WarpParams

    params = params or WarpParams()
    B, H, W = images.shape[0], images.shape[1], images.shape[2]
    h, w = att_maps.shape[-2], att_maps.shape[-1]

    def one_grid(am):
        px, py, tx, ty = attention_profiles(am, params)
        mx = inverse_axis_map(px, tx, new_width) * (W / w)
        my = inverse_axis_map(py, ty, new_height) * (H / h)
        return mx, my

    map_x, map_y = jax.vmap(one_grid)(att_maps)
    images_cf = jnp.moveaxis(images.astype(jnp.float32), -1, 1)
    out_cf = warp_batch_pallas_cf(images_cf, map_x, map_y, interpret=interpret)
    return jnp.moveaxis(out_cf, 1, -1)

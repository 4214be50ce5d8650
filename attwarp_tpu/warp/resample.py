"""Bilinear resampling with ``cv2.remap(INTER_LINEAR, BORDER_REPLICATE)``
semantics, expressed as XLA-friendly gathers.

cv2's float32 remap is exact float bilinear (no fixed-point fraction
quantization) and its uint8 path is exact bilinear followed by
round-half-to-even — both verified empirically against OpenCV 5.0. Border
replication is index clamping, which also covers out-of-range source
coordinates produced by the reference's ``[0, 1..N]`` knot convention (a
source coordinate of exactly ``N`` clamps to the last pixel, matching
``cv2.remap``; see new_method.py:246 and checkpoint_utils.py:172).

The warp grid is separable (``map_x`` depends only on the target column,
``map_y`` only on the target row), so instead of a 2-D gather we do two 1-D
gather+lerp passes — O(H·W·C) work, HBM-bandwidth bound, ideal for TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_lerp(img: jnp.ndarray, coords: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Linear interpolation of ``img`` along ``axis`` at float ``coords``,
    clamping neighbor indices (border replicate)."""
    n = img.shape[axis]
    i0f = jnp.floor(coords)
    frac = coords - i0f
    # clamp BOTH neighbors independently from the unclipped floor: for a
    # coordinate in [-1, 0) both neighbors replicate to index 0 (cv2
    # BORDER_REPLICATE), not {0, 1}
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0f.astype(jnp.int32) + 1, 0, n - 1)
    g0 = jnp.take(img, i0, axis=axis)
    g1 = jnp.take(img, i1, axis=axis)
    shape = [1] * img.ndim
    shape[axis] = coords.shape[0]
    frac = frac.reshape(shape)
    return g0 * (1.0 - frac) + g1 * frac


def remap_bilinear_separable(
    image: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray
) -> jnp.ndarray:
    """Warp ``image (H, W[, C])`` with per-axis source-coordinate vectors
    ``map_x (W_out,)`` and ``map_y (H_out,)`` -> ``(H_out, W_out[, C])``.

    Equivalent to ``cv2.remap(image, meshgrid(map_x, map_y)...)`` for
    separable maps, but factored into two 1-D passes.
    """
    img = image.astype(jnp.float32)
    w_axis = 1
    h_axis = 0
    out = _axis_lerp(img, map_x.astype(jnp.float32), axis=w_axis)
    out = _axis_lerp(out, map_y.astype(jnp.float32), axis=h_axis)
    return out


def remap_bilinear_2d(
    image: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray
) -> jnp.ndarray:
    """General (non-separable) remap: ``map_x, map_y`` are ``(H_out, W_out)``
    full coordinate grids. Provided for parity with arbitrary ``cv2.remap``
    use; the warp engine itself always uses the separable fast path."""
    img = image.astype(jnp.float32)
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    else:
        squeeze = False
    H, W = img.shape[0], img.shape[1]
    x0f = jnp.floor(map_x)
    y0f = jnp.floor(map_y)
    fx = (map_x - x0f)[..., None]
    fy = (map_y - y0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)
    p00 = img[y0, x0]
    p01 = img[y0, x1]
    p10 = img[y1, x0]
    p11 = img[y1, x1]
    out = (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )
    return out[..., 0] if squeeze else out


def saturate_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """cv2 ``saturate_cast<uchar>``: round half-to-even, clamp to [0, 255]."""
    return jnp.clip(jnp.rint(x), 0.0, 255.0).astype(jnp.uint8)


def interp_matrix(coords: jnp.ndarray, in_len: int) -> jnp.ndarray:
    """Bilinear interpolation as a two-banded ``(out_len, in_len)`` matrix.

    Row j carries weight ``1-frac`` at ``floor(coords[j])`` and ``frac`` at
    the next index, both clamped (border replicate; when both clamp to the
    same border index the weights sum back to 1, matching the gather path).

    This turns the separable warp into two MXU matmuls — on TPU an axis
    gather scalarizes (~22 GB/s effective) while the matmul form sustains
    >6x the throughput despite doing ~168x the nominal FLOPs.
    """
    i0 = jnp.floor(coords)
    frac = (coords - i0).astype(jnp.float32)
    i0c = jnp.clip(i0.astype(jnp.int32), 0, in_len - 1)
    i1c = jnp.clip(i0.astype(jnp.int32) + 1, 0, in_len - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], in_len), 1)
    return (cols == i0c[:, None]) * (1.0 - frac[:, None]) + (
        cols == i1c[:, None]
    ) * frac[:, None]


def _quant_pair_unit(x: jnp.ndarray):
    """Two-level int8 quantization of values with |x| ≤ 1:
    ``x ≈ (q_hi + q_lo/254) / 127`` with q_hi, q_lo ∈ [-127, 127].
    Residual ≤ 1/(2·127·254) ≈ 1.55e-5 — two int8 planes carry ~15 bits."""
    s = x * 127.0
    q_hi = jnp.clip(jnp.round(s), -127, 127)
    q_lo = jnp.clip(jnp.round((s - q_hi) * 254.0), -127, 127)
    return q_hi.astype(jnp.int8), q_lo.astype(jnp.int8)


def _einsum_int8_pair(spec: str, a_pair, b_pair):
    """``einsum(spec, A, B)`` where both operands are two-level int8 pairs
    (≈15-bit fixed point, ``_quant_pair_unit``). Three int8×int8 MXU passes
    with exact int32 accumulation — the MXU multiplies int8 at twice its
    bf16 rate, so this outruns the 3-pass bf16 decomposition
    (Precision.HIGH) at comparable accuracy. The dropped lo·lo term is
    ≤ 2/254² ≈ 3.1e-5 for two-banded interpolation rows. Returns f32 with
    the operands' [-1, 1] ranges restored."""
    a_hi, a_lo = a_pair
    b_hi, b_lo = b_pair

    def e(a, b):
        return jnp.einsum(spec, a, b, preferred_element_type=jnp.int32)

    main = e(a_hi, b_hi).astype(jnp.float32)
    corr = (e(a_hi, b_lo) + e(a_lo, b_hi)).astype(jnp.float32)
    return (main + corr * (1.0 / 254.0)) * (1.0 / (127.0 * 127.0))


def remap_bilinear_separable_mm_int8(
    image: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
) -> jnp.ndarray:
    """int8 fixed-point matmul remap: ``image (H, W[, C])`` -> warped.

    The fastest TPU path: both separable passes run as three int8×int8 MXU
    matmuls (two-level quantization) instead of three bf16 passes — the v5e
    MXU is 2x faster in int8, and int32 accumulation is exact. Accuracy
    ~1e-4 on [0,1]-scaled pixels (10x inside the ≤1e-3 cv2-parity budget;
    golden-tested in tests/test_warp_golden.py). Inputs outside [0,1] are
    handled by a dynamic per-call range scale.
    """
    img = image.astype(jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[0], img.shape[1]
    # dynamic range scale (≈1.0 for [0,1] pixel inputs, exact max otherwise)
    m = jnp.maximum(jnp.max(jnp.abs(img)), 1e-12)
    Rx = interp_matrix(map_x.astype(jnp.float32), W)  # (W_out, W), in [0,1]
    Ry = interp_matrix(map_y.astype(jnp.float32), H)  # (H_out, H)
    t = _einsum_int8_pair(
        "hwc,jw->hjc", _quant_pair_unit(img / m), _quant_pair_unit(Rx)
    )
    # rows of Rx sum to 1, so t stays in [-1-eps, 1+eps]: requantize directly
    out = _einsum_int8_pair(
        "ih,hjc->ijc", _quant_pair_unit(Ry), _quant_pair_unit(t)
    )
    out = out * m
    return out[..., 0] if squeeze else out


def remap_bilinear_separable_mm(
    image: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
    precision=jax.lax.Precision.HIGH,
) -> jnp.ndarray:
    """Matmul-form separable remap: ``image (H, W[, C])`` -> warped.

    The TPU throughput path. Default HIGH precision (3-pass bf16) keeps the
    result within ~5e-5 of the exact gather path on [0,1]-scaled pixels —
    20x inside the ≤1e-3 parity budget — at ~1.7x the throughput of HIGHEST
    (6-pass). Pass ``jax.lax.Precision.HIGHEST`` for ~2e-7 parity. The
    gather form remains the bit-reference.
    """
    img = image.astype(jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[0], img.shape[1]
    Rx = interp_matrix(map_x.astype(jnp.float32), W)  # (W_out, W)
    Ry = interp_matrix(map_y.astype(jnp.float32), H)  # (H_out, H)
    t = jnp.einsum("hwc,jw->hjc", img, Rx, precision=precision)
    out = jnp.einsum("ih,hjc->ijc", Ry, t, precision=precision)
    return out[..., 0] if squeeze else out

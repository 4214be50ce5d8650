"""Public warp APIs (single-image, batched, and CDF-driven).

- ``warp_image_by_attention``: parity with new_method.py:198-283 (C1).
- ``warp_from_cdf``:           parity with checkpoint_utils.py:133-204 (C4),
                               but batched on-device instead of a per-sample
                               host ``cv2.remap`` loop.
- ``warp_batch_by_attention``: the throughput path — the full fused pipeline
                               (transform -> marginals -> CDF -> inverse map ->
                               separable bilinear gather) vmapped over the
                               batch and jit-compiled once per shape.

All shapes are static; batching uses ``jax.vmap`` so the same code serves
single-chip and, via ``shard_map`` over a mesh (see attwarp_tpu.parallel),
multi-chip data-parallel execution with zero cross-chip traffic per image.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from attwarp_tpu.warp.grid import (
    attention_profiles,
    inverse_axis_map,
    inverse_axis_map_from_cdf,
)
from attwarp_tpu.warp.resample import (
    remap_bilinear_separable,
    remap_bilinear_separable_mm,
    remap_bilinear_separable_mm_int8,
)
from attwarp_tpu.warp.transforms import WarpParams


def _resample(image, map_x, map_y, method: str):
    if method == "mm":
        return remap_bilinear_separable_mm(image, map_x, map_y)
    if method == "mm_int8":
        return remap_bilinear_separable_mm_int8(image, map_x, map_y)
    if method == "mm_exact":
        return remap_bilinear_separable_mm(
            image, map_x, map_y, precision=jax.lax.Precision.HIGHEST
        )
    return remap_bilinear_separable(image, map_x, map_y)


def _single_warp(
    image: jnp.ndarray,
    att_map: jnp.ndarray,
    new_width: int,
    new_height: int,
    params: WarpParams,
    method: str = "gather",
) -> jnp.ndarray:
    profile_x, profile_y, total_x, total_y = attention_profiles(att_map, params)
    map_x = inverse_axis_map(profile_x, total_x, new_width)
    map_y = inverse_axis_map(profile_y, total_y, new_height)
    return _resample(image, map_x, map_y, method)


@partial(jax.jit, static_argnames=("new_width", "new_height", "params"))
def warp_image_by_attention(
    image: jnp.ndarray,
    att_map: jnp.ndarray,
    new_width: int,
    new_height: int,
    params: WarpParams = WarpParams(),
) -> jnp.ndarray:
    """Warp one ``image (H, W[, C])`` by ``att_map (H, W)`` to
    ``(new_height, new_width[, C])`` — the C1 reference semantics.

    The image and attention map must share H×W (the reference asserts the
    same by resizing the image first; see save_warped_image,
    new_method.py:477-486)."""
    return _single_warp(image, att_map, new_width, new_height, params)


@partial(
    jax.jit, static_argnames=("new_width", "new_height", "params", "method")
)
def warp_batch_by_attention(
    images: jnp.ndarray,
    att_maps: jnp.ndarray,
    new_width: int,
    new_height: int,
    params: WarpParams = WarpParams(),
    method: str = "mm",
) -> jnp.ndarray:
    """Batched fused warp: ``images (B, H, W[, C])``, ``att_maps (B, h, w)``.

    ``method``: ``"mm"`` (default) resamples via two MXU interpolation-matrix
    matmuls at HIGH precision — the TPU throughput path (~10x the gather
    form on-chip, within ~5e-5 of it on [0,1] pixels); ``"mm_exact"`` is the
    same at HIGHEST precision (~2e-7); ``"gather"`` is the bit-reference;
    ``"pallas"`` routes to the fused Pallas kernel
    (attwarp_tpu.ops.pallas_warp); ``"auto"`` picks by the measured v5e
    crossover — the Pallas kernel for ≥640px images (wins 11-28x at 672px
    b32-b128, where XLA's HBM working set spills), the einsum pair below
    (86k vs 65k at 336px, 29k vs 27k at 500px; ARCHITECTURE.md §4).

    If the attention resolution differs from the image resolution the
    marginals are computed at attention resolution and inverted directly to
    image coordinates — mathematically identical to first nearest-upsampling
    the attention (the piecewise-constant density integrates to the same
    CDF), and much cheaper than materializing an image-res attention map.
    """
    if method == "auto":
        method = "pallas" if min(images.shape[1], images.shape[2]) >= 640 else "mm"
    if method == "pallas":
        from attwarp_tpu.ops.pallas_warp import warp_batch_by_attention_pallas

        return warp_batch_by_attention_pallas.__wrapped__(
            images, att_maps, new_width, new_height, params, False
        )
    if att_maps.shape[-2:] == images.shape[1:3]:
        return jax.vmap(
            lambda im, am: _single_warp(im, am, new_width, new_height, params, method)
        )(images, att_maps)
    return jax.vmap(
        lambda im, am: _single_warp_lowres_att(
            im, am, new_width, new_height, params, method
        )
    )(images, att_maps)


def _single_warp_lowres_att(
    image: jnp.ndarray,
    att_map: jnp.ndarray,
    new_width: int,
    new_height: int,
    params: WarpParams,
    method: str = "gather",
) -> jnp.ndarray:
    """Warp with an attention map at a coarser resolution than the image.

    The C1 forward map built from an (h, w) attention grid is piecewise
    linear with knots at cell boundaries; evaluating its inverse at image
    coordinates needs the source coordinate rescaled from attention cells to
    image pixels: a cell index c in [0, w] maps to image coordinate
    c * (W_img / w). This reproduces warping an att-res-resized image, while
    sampling from the full-resolution image (higher quality than the
    reference, which downsizes the image to attention resolution first —
    identical when resolutions match, which is how every reference driver
    calls it)."""
    H, W = image.shape[0], image.shape[1]
    profile_x, profile_y, total_x, total_y = attention_profiles(att_map, params)
    h, w = att_map.shape[-2], att_map.shape[-1]
    map_x = inverse_axis_map(profile_x, total_x, new_width) * (W / w)
    map_y = inverse_axis_map(profile_y, total_y, new_height) * (H / h)
    return _resample(image, map_x, map_y, method)


@partial(jax.jit, static_argnames=("out_size", "tie_jitter", "method"))
def warp_from_cdf(
    images: jnp.ndarray,
    Fx: jnp.ndarray,
    Fy: jnp.ndarray,
    out_size: Optional[Tuple[int, int]] = None,
    tie_jitter: bool = True,
    method: str = "gather",
) -> jnp.ndarray:
    """Batched CDF-driven warp (C4 semantics, checkpoint_utils.py:133-204).

    images: ``(B, H, W, C)`` (channels-last; use ``jnp.moveaxis`` for NCHW)
    Fx: ``(B, W)`` CDF along X in [0, 1]; Fy: ``(B, H)`` CDF along Y.
    out_size: ``(H_out, W_out)`` or None to keep ``(H, W)``.
    ``method``: "gather" (bit-reference default) or "mm"/"mm_exact" for the
    MXU throughput path.
    """
    B, H, W = images.shape[0], images.shape[1], images.shape[2]
    H_out, W_out = (H, W) if out_size is None else out_size

    def one(img, fx, fy):
        map_x = inverse_axis_map_from_cdf(fx, W_out, tie_jitter=tie_jitter)
        map_y = inverse_axis_map_from_cdf(fy, H_out, tie_jitter=tie_jitter)
        return _resample(img, map_x, map_y, method)

    return jax.vmap(one)(images, Fx, Fy)

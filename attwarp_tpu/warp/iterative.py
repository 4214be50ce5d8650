"""Iterative warping + attention-map conditioning (C26 warp math).

The SD-warp ablation (``Ablations/Stable_diffusion_based_warp.py``) feeds a
diffusion-cross-attention map into the same warp engine, with two extra
pieces that are attention-source-agnostic and live here:

- ``condition_attention_map``: low-res map -> cubic upsample to image res ->
  5×5 Gaussian blur (sigma 1.0) -> min-max normalize (:407-413, :399-402).
- ``iterative_warp``: apply the warp N times, dividing ``exp_scale`` by N so
  the cumulative distortion matches one full-strength warp (:446-455).

The diffusion-specific attention capture requires the third-party
``attention_map_diffusers`` package + SD weights and is gated behind
``attwarp_tpu.cli`` availability checks (this environment has neither).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.numerics.precision import matmul_f32
from attwarp_tpu.warp.transforms import Transform, WarpParams
from attwarp_tpu.warp.warp import warp_image_by_attention


@lru_cache(maxsize=8)
def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics."""
    r = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


@lru_cache(maxsize=64)
def _gaussian_matrix_np(n: int, ksize: int, sigma: float) -> np.ndarray:
    """1-D Gaussian filter with replicate border as an (n, n) matrix."""
    from attwarp_tpu.warp.blend import replicate_fir_matrix

    return replicate_fir_matrix(n, _gaussian_kernel1d(ksize, sigma))


def gaussian_blur(x: jnp.ndarray, ksize: int = 5, sigma: float = 1.0) -> jnp.ndarray:
    """Separable Gaussian blur (replicate border) as two matmuls."""
    h, w = x.shape[-2], x.shape[-1]
    Gy = jnp.asarray(_gaussian_matrix_np(h, ksize, sigma), jnp.float32)
    Gx = jnp.asarray(_gaussian_matrix_np(w, ksize, sigma), jnp.float32)
    return matmul_f32(matmul_f32(Gy, x.astype(jnp.float32)), Gx.T)


@partial(jax.jit, static_argnames=("target_hw",))
def condition_attention_map(
    att_lr: jnp.ndarray, target_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Low-res attention -> image-res conditioned map in [0, 1]."""
    from attwarp_tpu.warp.blend import resize_cubic

    a = att_lr.astype(jnp.float32)
    a = a - jnp.min(a)
    a = a / (jnp.max(a) + 1e-9)
    # cv2-kernel bicubic (Keys a=-0.75), matching upsample_attention_map
    full = resize_cubic(a, target_hw)
    full = gaussian_blur(full, 5, 1.0)
    full = full - jnp.min(full)
    return full / (jnp.max(full) + 1e-9)


def iterative_warp(
    image: jnp.ndarray,
    att_map: jnp.ndarray,
    width: int,
    height: int,
    iterations: int = 1,
    transform: Transform = Transform.IDENTITY,
    exp_scale: float = 1.0,
    exp_divisor: float = 1.0,
    apply_inverse: bool = False,
) -> List[jnp.ndarray]:
    """Apply the warp ``iterations`` times with exp_scale / iterations each
    step; returns every intermediate (last element is the final image). The
    attention map stays fixed (as in the reference), so successive warps
    compound the magnification."""
    step_scale = exp_scale / max(1, iterations)
    params = WarpParams(
        transform=transform,
        exp_scale=step_scale,
        exp_divisor=exp_divisor,
        apply_inverse_to_marginals=apply_inverse,
    )
    outs: List[jnp.ndarray] = []
    cur = image
    att = att_map
    for _ in range(iterations):
        # the att map must match the current image dims; after the first
        # iteration the image is (height, width) so resize the map once
        if att.shape[:2] != cur.shape[:2]:
            att = jax.image.resize(att.astype(jnp.float32), cur.shape[:2], "linear")
        cur = warp_image_by_attention(cur, att, width, height, params)
        outs.append(cur)
    return outs

"""Learned-warp inference: MarginalNet predicts the marginals, the CDF warp
applies them — no oracle attention pass needed (BASELINE config 3; the
reference trains MarginalNet for exactly this but ships no inference
driver).

The whole pipeline — frozen-feature projection, marginal prediction,
right-inverse upsampling to image resolution, CDF construction, warp — is
one jitted XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from attwarp_tpu.numerics.cdf import cdf_from_density
from attwarp_tpu.marginalnet.model import ATTENTION_GRID
from attwarp_tpu.numerics.pooling import upsample_pdf_right_inverse


@partial(jax.jit, static_argnames=("model", "out_size", "method"))
def predict_and_warp(
    params,
    model,
    images: jnp.ndarray,   # (B, H, W, 3) float [0, 1]
    fmap_v: jnp.ndarray,   # (B, hv, wv, Dv) frozen MLLM visual tokens
    ttok: jnp.ndarray,     # (B, Lt, Dt) frozen text tokens
    tmask: jnp.ndarray,    # (B, Lt, 1)
    out_size: Tuple[int, int] | None = None,
    method: str = "mm",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (warped images, px (B, W), py (B, H))."""
    from attwarp_tpu.warp.warp import warp_from_cdf

    H, W = images.shape[1], images.shape[2]
    px, py = model.apply({"params": params}, fmap_v, ATTENTION_GRID, ttok, tmask)
    px_img = jnp.clip(upsample_pdf_right_inverse(px, W), 0.0, None)
    py_img = jnp.clip(upsample_pdf_right_inverse(py, H), 0.0, None)
    Fx = cdf_from_density(px_img)
    Fy = cdf_from_density(py_img)
    warped = warp_from_cdf.__wrapped__(images, Fx, Fy, out_size, True, method)
    return warped, px, py

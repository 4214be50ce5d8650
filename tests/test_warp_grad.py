"""Differentiability of the warp — a capability the reference cannot have
(cv2.remap on host NumPy breaks the graph; SURVEY C4 notes the debug warp
'bounces to CPU'). Here attention -> grid -> resample is jnp end-to-end, so
gradients flow through the warp to BOTH the image and the attention map,
enabling warp-in-the-loss training schemes."""

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.warp import WarpParams, warp_batch_by_attention
from attwarp_tpu.warp.warp import warp_from_cdf
from attwarp_tpu.numerics import cdf_from_density


def test_grad_flows_to_image_and_attention(rng):
    B, S = 2, 24
    imgs = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)
    atts = jnp.asarray(rng.random((B, 8, 8)) + 0.1, jnp.float32)

    def loss(imgs, atts):
        w = warp_batch_by_attention.__wrapped__(imgs, atts, S, S, WarpParams(), "mm")
        return jnp.sum(w**2)

    gi, ga = jax.grad(loss, argnums=(0, 1))(imgs, atts)
    assert gi.shape == imgs.shape and ga.shape == atts.shape
    assert np.isfinite(np.asarray(gi)).all() and np.isfinite(np.asarray(ga)).all()
    assert float(jnp.abs(gi).max()) > 0
    assert float(jnp.abs(ga).max()) > 0


def test_grad_through_cdf_warp(rng):
    """Gradient w.r.t. the predicted marginals — the path a warp-in-the-loss
    MarginalNet objective would use."""
    B, S = 2, 16
    imgs = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)
    p = jnp.asarray(rng.random((B, S)) + 0.1, jnp.float32)

    def loss(p):
        F = cdf_from_density(p)
        w = warp_from_cdf.__wrapped__(imgs, F, F, None, False, "mm")
        return jnp.mean((w - imgs) ** 2)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0

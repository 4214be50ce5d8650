"""Parity of the MXU matmul resample path against the exact gather path."""

import numpy as np
import jax.numpy as jnp

from attwarp_tpu.warp import warp_batch_by_attention
from attwarp_tpu.warp.resample import (
    remap_bilinear_separable,
    remap_bilinear_separable_mm,
)


def test_mm_matches_gather(rng):
    img = (rng.random((40, 56, 3)) * 255).astype(np.float32)
    mx = (rng.random(48) * 56).astype(np.float32)
    my = (rng.random(32) * 40).astype(np.float32)
    a = np.asarray(remap_bilinear_separable(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    b = np.asarray(remap_bilinear_separable_mm(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    assert a.shape == b.shape == (32, 48, 3)
    assert np.max(np.abs(a - b)) <= 1e-3 * 255


def test_mm_border_replicate(rng):
    """Out-of-range coords (incl. the reference's coordinate == N case)."""
    img = (rng.random((10, 12)) * 255).astype(np.float32)
    mx = np.array([-1.5, -0.3, 0.0, 11.0, 12.0, 13.7], np.float32)
    my = np.array([0.0, 9.99, 10.0, -2.0], np.float32)
    a = np.asarray(remap_bilinear_separable(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    b = np.asarray(remap_bilinear_separable_mm(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_batched_mm_vs_gather_method(rng):
    B = 3
    imgs = (rng.random((B, 36, 36, 3)) * 255).astype(np.float32)
    atts = rng.random((B, 24, 24)).astype(np.float32)
    a = np.asarray(warp_batch_by_attention(jnp.asarray(imgs), jnp.asarray(atts), 36, 36, method="gather"))
    b = np.asarray(warp_batch_by_attention(jnp.asarray(imgs), jnp.asarray(atts), 36, 36, method="mm"))
    assert np.max(np.abs(a - b)) <= 1e-3 * 255

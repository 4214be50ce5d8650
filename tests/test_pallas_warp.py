"""Pallas fused warp kernel vs the gather reference (interpret mode on CPU;
compiled parity is exercised on real TPU by bench/verification runs)."""

import numpy as np
import jax.numpy as jnp

from attwarp_tpu.ops.pallas_warp import warp_batch_by_attention_pallas
from attwarp_tpu.warp import warp_batch_by_attention


def test_pallas_matches_gather_interpret(rng):
    B, IMG, ATT = 3, 64, 8
    images = jnp.asarray(rng.random((B, IMG, IMG, 3)) * 255, jnp.float32)
    atts = jnp.asarray(rng.random((B, ATT, ATT)), jnp.float32)
    a = np.asarray(
        warp_batch_by_attention_pallas(images, atts, IMG, IMG, interpret=True)
    )
    b = np.asarray(warp_batch_by_attention(images, atts, IMG, IMG, method="gather"))
    assert np.max(np.abs(a - b)) <= 1e-3 * 255


def test_pallas_resize_output(rng):
    B = 2
    images = jnp.asarray(rng.random((B, 48, 48, 3)) * 255, jnp.float32)
    atts = jnp.asarray(rng.random((B, 8, 8)), jnp.float32)
    a = np.asarray(
        warp_batch_by_attention_pallas(images, atts, 64, 32, interpret=True)
    )
    b = np.asarray(warp_batch_by_attention(images, atts, 64, 32, method="gather"))
    assert a.shape == (B, 32, 64, 3)
    assert np.max(np.abs(a - b)) <= 1e-3 * 255

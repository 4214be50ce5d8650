"""Learned-warp inference pipeline (BASELINE config 3)."""

import jax
import numpy as np
import jax.numpy as jnp

from attwarp_tpu.marginalnet import MarginalNet, predict_and_warp


def test_predict_and_warp(rng):
    B, IMG = 2, 64
    model = MarginalNet(hidden=32)
    fmap = jnp.asarray(rng.random((B, 8, 8, 16)), jnp.float32)
    ttok = jnp.asarray(rng.random((B, 6, 16)), jnp.float32)
    tmask = jnp.ones((B, 6, 1), jnp.float32)
    images = jnp.asarray(rng.random((B, IMG, IMG, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), fmap, (24, 24), ttok, tmask)["params"]

    warped, px, py = predict_and_warp(params, model, images, fmap, ttok, tmask)
    assert warped.shape == images.shape
    assert px.shape == (B, 24) and py.shape == (B, 24)
    assert np.isfinite(np.asarray(warped)).all()
    # total image content preserved (area-preserving warp): means stay close
    np.testing.assert_allclose(
        float(warped.mean()), float(images.mean()), atol=0.05
    )
    # out_size works
    w2, _, _ = predict_and_warp(params, model, images, fmap, ttok, tmask, out_size=(32, 48))
    assert w2.shape == (B, 32, 48, 3)


def test_graft_entry_compiles(rng):
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 336, 336, 3)
    assert np.isfinite(np.asarray(out[0, :4, :4])).all()

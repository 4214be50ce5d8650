"""Multi-device sharded warp: zero-collective data parallelism."""

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.parallel import make_mesh, make_sharded_warp, shard_batch
from attwarp_tpu.warp import warp_batch_by_attention


def test_sharded_warp_matches_single_device(rng):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_data=8, n_model=1)
    B, IMG, ATT = 16, 48, 8
    images = jnp.asarray(rng.random((B, IMG, IMG, 3)) * 255, jnp.float32)
    atts = jnp.asarray(rng.random((B, ATT, ATT)), jnp.float32)

    fn = make_sharded_warp(mesh, IMG, IMG, method="gather")
    sharded = shard_batch({"i": images, "a": atts}, mesh)
    out = fn(sharded["i"], sharded["a"])
    ref = warp_batch_by_attention(images, atts, IMG, IMG, method="gather")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    # the compiled program must contain no collectives (fully local warps)
    lowered = fn.lower(sharded["i"], sharded["a"]).compile()
    hlo = lowered.as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute", "all-to-all"):
        assert coll not in hlo, f"unexpected collective {coll} in sharded warp"


def test_warp_from_cdf_mm_method(rng):
    from attwarp_tpu.numerics import cdf_from_density
    from attwarp_tpu.warp import warp_from_cdf

    B, H, W = 3, 30, 34
    imgs = jnp.asarray(rng.random((B, H, W, 3)) * 255, jnp.float32)
    Fx = cdf_from_density(jnp.asarray(rng.random((B, W)), jnp.float32))
    Fy = cdf_from_density(jnp.asarray(rng.random((B, H)), jnp.float32))
    a = np.asarray(warp_from_cdf(imgs, Fx, Fy, method="gather"))
    b = np.asarray(warp_from_cdf(imgs, Fx, Fy, method="mm"))
    assert np.max(np.abs(a - b)) <= 1e-3 * 255

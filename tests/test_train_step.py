"""MarginalNet + train step: shape, convergence, and multi-device sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attwarp_tpu.marginalnet import MarginalNet
from attwarp_tpu.parallel import make_mesh
from attwarp_tpu.train import (
    TrainConfig,
    create_train_state,
    eval_step,
    make_sharded_train_step,
    train_step,
)


def _fake_batch(rng, B=8, img=64, hv=8, Dv=32, Lt=12, Dt=48):
    return {
        "image": jnp.asarray(rng.random((B, img, img, 3)), jnp.float32),
        "attention_map": jnp.asarray(rng.random((B, img, img)), jnp.float32),
        "sqrt_mask": jnp.asarray(rng.integers(0, 2, (B,)), jnp.float32),
        "none_mask": jnp.zeros((B,), jnp.float32),
        "fmap_v": jnp.asarray(rng.random((B, hv, hv, Dv)), jnp.float32),
        "ttok": jnp.asarray(rng.random((B, Lt, Dt)), jnp.float32),
        "tmask": jnp.ones((B, Lt, 1), jnp.float32),
    }


@pytest.fixture(scope="module")
def cfg():
    return TrainConfig(hidden=64, lr=1e-3)


def test_model_outputs_normalized(rng, cfg):
    batch = _fake_batch(rng)
    model = MarginalNet(hidden=cfg.hidden)
    params = model.init(
        jax.random.PRNGKey(0), batch["fmap_v"], (24, 24), batch["ttok"], batch["tmask"]
    )["params"]
    px, py = model.apply({"params": params}, batch["fmap_v"], (24, 24), batch["ttok"], batch["tmask"])
    assert px.shape == (8, 24) and py.shape == (8, 24)
    np.testing.assert_allclose(np.asarray(px.sum(-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(py.sum(-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(px) >= 0)


def test_train_step_descends(rng, cfg):
    batch = _fake_batch(rng)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(12):
        state, metrics = train_step(state, batch, model, cfg)
        losses.append(float(metrics["loss/total"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12
    assert np.isfinite(losses).all()


def test_watch_gradients_per_module_norms(rng, cfg):
    """cfg.watch_gradients adds per-module grad norms (wandb.watch parity);
    their squared sum reconstructs the global norm."""
    import dataclasses

    wcfg = dataclasses.replace(cfg, watch_gradients=True)
    batch = _fake_batch(rng)
    model, state = create_train_state(wcfg, jax.random.PRNGKey(0), batch)
    _, metrics = train_step(state, batch, model, wcfg)
    per = {k: float(v) for k, v in metrics.items() if k.startswith("grad_norm/")}
    assert per, "no per-module norms emitted"
    assert all(np.isfinite(v) for v in per.values())
    total = float(metrics["grad_norm"])
    np.testing.assert_allclose(
        np.sqrt(sum(v**2 for v in per.values())), total, rtol=1e-5
    )
    # off by default: no per-module keys
    _, m0 = train_step(state, batch, model, cfg)
    assert not any(k.startswith("grad_norm/") for k in m0)


def test_eval_step(rng, cfg):
    batch = _fake_batch(rng)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    m = eval_step(state, batch, model, cfg)
    assert np.isfinite(float(m["loss/total"]))


def test_sharded_train_step_matches_single(rng, cfg):
    """dp=4 x tp=2 sharded step must agree with the single-device step."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    batch = _fake_batch(rng, B=8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    single_state, single_metrics = train_step(state, batch, model, cfg)

    mesh = make_mesh(n_data=4, n_model=2)
    fn, s_state, s_batch = make_sharded_train_step(model, cfg, mesh, state, batch)
    sh_state, sh_metrics = fn(s_state, s_batch)

    np.testing.assert_allclose(
        float(sh_metrics["loss/total"]), float(single_metrics["loss/total"]), rtol=2e-2
    )
    # parameters should match within bf16 forward noise
    flat_a = jax.tree_util.tree_leaves(single_state.params)
    flat_b = jax.tree_util.tree_leaves(sh_state.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)

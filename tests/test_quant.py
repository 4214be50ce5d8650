"""int8 w8a8 quantization: numerics and end-to-end decoder behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attwarp_tpu.models.llama import (
    LlamaConfig,
    llama_decode_step,
    llama_prefill,
)
from attwarp_tpu.numerics.quant import (
    apply_linear,
    quantize_decoder_params,
    quantize_linear,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def test_quantize_linear_error_bound(rng):
    w = rng.standard_normal((64, 48)).astype(np.float32)
    qw = quantize_linear(w)
    assert qw["q"].dtype == jnp.int8 and qw["s"].shape == (64,)
    deq = np.asarray(qw["q"], np.float32) * np.asarray(qw["s"])[:, None]
    # symmetric rounding: per-channel error is at most half a quantization step
    assert (np.abs(deq - w) <= np.asarray(qw["s"])[:, None] * 0.5 + 1e-7).all()


def test_apply_linear_matches_dense(rng):
    w = rng.standard_normal((96, 128)).astype(np.float32) / np.sqrt(128)
    x = rng.standard_normal((4, 7, 128)).astype(np.float32)
    dense = np.asarray(apply_linear(jnp.asarray(x), jnp.asarray(w)))
    quant = np.asarray(apply_linear(jnp.asarray(x), quantize_linear(jnp.asarray(w))))
    assert _cos(dense, quant) > 0.999
    rel = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-12)
    assert rel < 0.05, rel


def test_apply_linear_bias_forms(rng):
    w = rng.standard_normal((32, 24)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    x = rng.standard_normal((3, 24)).astype(np.float32)
    dense = np.asarray(
        apply_linear(jnp.asarray(x), {"weight": jnp.asarray(w), "bias": jnp.asarray(b)})
    )
    np.testing.assert_allclose(dense, x @ w.T + b, rtol=1e-5, atol=1e-5)
    qw = quantize_linear({"weight": jnp.asarray(w), "bias": jnp.asarray(b)})
    assert "b" in qw
    quant = np.asarray(apply_linear(jnp.asarray(x), qw))
    assert _cos(dense, quant) > 0.995


def _rand_llama(cfg: LlamaConfig, seed=0):
    r = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, kvH, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    def lin(o, i):
        return jnp.asarray(r.standard_normal((o, i)) / np.sqrt(i), jnp.float32)

    layers = [
        {
            "q_proj": lin(H * hd, D), "k_proj": lin(kvH * hd, D),
            "v_proj": lin(kvH * hd, D), "o_proj": lin(D, D),
            "gate_proj": lin(I, D), "up_proj": lin(I, D),
            "down_proj": lin(D, I),
            "input_layernorm": jnp.ones((D,)),
            "post_attention_layernorm": jnp.ones((D,)),
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    return {
        "embed_tokens": jnp.asarray(
            r.standard_normal((cfg.vocab_size, D)) * 0.05, jnp.float32
        ),
        "norm": jnp.ones((D,)),
        "layers": layers,
    }


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
    )
    return cfg, _rand_llama(cfg)


def test_llama_prefill_int8_close(tiny, rng):
    cfg, params = tiny
    qparams = quantize_decoder_params(params)
    # layernorms / embeddings untouched; linears now int8 dicts
    assert qparams["layers"][0]["q_proj"]["q"].dtype == jnp.int8
    assert qparams["layers"][0]["input_layernorm"].dtype != jnp.int8

    embeds = jnp.asarray(rng.standard_normal((2, 12, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((2, 12), bool)
    lf, kvf, rowf = llama_prefill(params, cfg, embeds, mask, max_seq=16,
                                  extract_layer=1)
    lq, kvq, rowq = llama_prefill(qparams, cfg, embeds, mask, max_seq=16,
                                  extract_layer=1)
    assert _cos(lf, lq) > 0.98, _cos(lf, lq)
    assert _cos(rowf, rowq) > 0.98
    np.testing.assert_allclose(
        np.asarray(rowq).sum(-1), 1.0, atol=1e-4
    )  # still a softmax row

    # decode one step against each cache
    tok = jnp.asarray(rng.standard_normal((2, 1, 64)) * 0.5, jnp.float32)
    pos = jnp.full((2,), 12, jnp.int32)
    kvm = jnp.arange(16)[None, :] < 13
    df, _, _ = llama_decode_step(params, cfg, tok, kvf, jnp.int32(12), pos,
                                 jnp.broadcast_to(kvm, (2, 16)))
    dq, _, _ = llama_decode_step(qparams, cfg, tok, kvq, jnp.int32(12), pos,
                                 jnp.broadcast_to(kvm, (2, 16)))
    assert _cos(df, dq) > 0.98, _cos(df, dq)


def test_int8_params_are_smaller(tiny):
    cfg, params = tiny
    qparams = quantize_decoder_params(params)

    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(t))

    dense = nbytes(params["layers"])
    quant = nbytes(qparams["layers"])
    assert quant < dense * 0.30, (quant, dense)  # ~4x smaller vs f32


def test_int8_orbax_roundtrip(tiny, rng, tmp_path):
    """Quantized trees checkpoint and restore exactly (int8 leaves incl.)."""
    import orbax.checkpoint as ocp

    cfg, params = tiny
    qparams = quantize_decoder_params(params)
    with ocp.StandardCheckpointer() as ck:
        ck.save((tmp_path / "q").absolute(), qparams, force=True)
        restored = ck.restore((tmp_path / "q").absolute())
    for a, b in zip(jax.tree_util.tree_leaves(qparams),
                    jax.tree_util.tree_leaves(restored)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    embeds = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
    mask = jnp.ones((1, 5), bool)
    la, _, _ = llama_prefill(qparams, cfg, embeds, mask, max_seq=6)
    lb, _, _ = llama_prefill(restored, cfg, embeds, mask, max_seq=6)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_int8_under_jit_and_grad_free(tiny, rng):
    """The quantized tree must be jittable (int8 leaves are fine as pytree
    inputs) and produce identical results across calls."""
    cfg, params = tiny
    qparams = quantize_decoder_params(params)
    embeds = jnp.asarray(rng.standard_normal((1, 6, 64)), jnp.float32)
    mask = jnp.ones((1, 6), bool)

    f = jax.jit(lambda p, e: llama_prefill(p, cfg, e, mask, max_seq=8)[0])
    a = np.asarray(f(qparams, embeds))
    b = np.asarray(f(qparams, embeds))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()

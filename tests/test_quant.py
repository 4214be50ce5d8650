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


def test_lm_logits_forms(tiny, rng):
    """lm_logits: dense form bit-identical to the original inline matmul;
    int8 form (quantize_lm_head, backend spec '+lm8') close + f32 output;
    tied-head fallback untouched by quantization."""
    from attwarp_tpu.numerics.quant import lm_logits, quantize_lm_head

    cfg, params = tiny
    x = jnp.asarray(rng.standard_normal((4, cfg.hidden_size)), jnp.float32)
    dense = lm_logits(x, params)
    ref = np.asarray(x, np.float32) @ np.asarray(
        params["embed_tokens"], np.float32).T
    np.testing.assert_allclose(np.asarray(dense), ref, rtol=1e-5, atol=1e-5)

    qp = quantize_lm_head(params)
    assert qp["lm_head"]["q"].dtype == jnp.int8
    # the tied embedding table stays dense for the lookup path
    assert qp["embed_tokens"].dtype == params["embed_tokens"].dtype
    ql = lm_logits(x, qp)
    assert ql.dtype == jnp.float32
    assert _cos(dense, ql) > 0.999


def test_lm8_margin_guarantee_and_decode_path(tiny, rng):
    """The int8 LM head's real guarantee, stated as a test: int8 logits
    track dense logits closely, and the int8 argmax agrees wherever the
    dense top-2 margin exceeds twice the measured quantization error. A
    random 97-vocab tiny model has near-tie margins almost everywhere, so
    token-exact greedy equality is NOT the contract (one flip cascades) —
    which is exactly why '+lm8' is opt-in on real models too. Also smokes
    the quantized head through prefill + decode_step (the serving path)."""
    from attwarp_tpu.numerics.quant import lm_logits, quantize_lm_head

    cfg, params = tiny
    qp = quantize_lm_head(params)

    xs = jnp.asarray(rng.standard_normal((64, cfg.hidden_size)) * 2.0,
                     jnp.float32)
    dense = np.asarray(lm_logits(xs, params))
    quant = np.asarray(lm_logits(xs, qp))
    err = np.abs(dense - quant).max()
    assert _cos(dense, quant) > 0.999
    top2 = np.sort(dense, axis=-1)
    margin = top2[:, -1] - top2[:, -2]
    safe = margin > 2 * err
    assert safe.any()  # the guarantee is non-vacuous on this draw
    np.testing.assert_array_equal(dense[safe].argmax(-1),
                                  quant[safe].argmax(-1))

    # serving path: quantized head runs through prefill + one decode step
    # and the logits stay close to dense at every position
    embeds = jnp.asarray(rng.standard_normal((2, 12, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((2, 12), bool)
    ld, kvd, _ = llama_prefill(params, cfg, embeds, mask, max_seq=20)
    lq, kvq, _ = llama_prefill(qp, cfg, embeds, mask, max_seq=20)
    assert _cos(ld, lq) > 0.999
    tok = jnp.argmax(ld, -1)
    emb = params["embed_tokens"][tok][:, None, :]
    pos = jnp.full((2,), 12, jnp.int32)
    kvm = jnp.broadcast_to(jnp.arange(20)[None, :] < 13, (2, 20))
    ld2, _, _ = llama_decode_step(params, cfg, emb, kvd,
                                  jnp.int32(12), pos, kvm)
    lq2, _, _ = llama_decode_step(qp, cfg, emb, kvq,
                                  jnp.int32(12), pos, kvm)
    assert _cos(ld2, lq2) > 0.999


def test_quantize_kv_roundtrip_bound(rng):
    from attwarp_tpu.numerics.quant import dequantize_kv, quantize_kv

    x = jnp.asarray(rng.standard_normal((2, 9, 3, 16)) * 4.0, jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 9, 3)
    deq = np.asarray(dequantize_kv(q, s, jnp.float32))
    # symmetric rounding: error at most half a step per (token, head) slot
    step = np.asarray(s)[..., None]
    assert (np.abs(deq - np.asarray(x)) <= step * 0.5 + 1e-7).all()
    # zero rows quantize to exact zeros (padded cache slots)
    qz, sz = quantize_kv(jnp.zeros((1, 4, 2, 8)))
    assert (np.asarray(qz) == 0).all()
    assert (np.asarray(dequantize_kv(qz, sz, jnp.float32)) == 0).all()


def test_llama_kv_quant_prefill_exact_then_decode_close(tiny, rng):
    """kv_quant changes only the STORED cache: prefill logits/rows are
    bit-identical to dense; chained decode steps stay close (the history the
    step reads is int8)."""
    from attwarp_tpu.models.llama import QuantKVCache

    cfg, params = tiny
    embeds = jnp.asarray(rng.standard_normal((2, 12, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((2, 12), bool)
    lf, kvf, rowf = llama_prefill(params, cfg, embeds, mask, max_seq=16,
                                  extract_layer=1)
    lq, kvq, rowq = llama_prefill(params, cfg, embeds, mask, max_seq=16,
                                  extract_layer=1, kv_quant=True)
    assert isinstance(kvq, QuantKVCache)
    assert kvq.k_q.dtype == jnp.int8 and kvq.k_s.shape == (3, 2, 16, 2)
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lq))
    np.testing.assert_array_equal(np.asarray(rowf), np.asarray(rowq))

    # three chained decode steps against each cache form
    tok = jnp.asarray(rng.standard_normal((2, 1, 64)) * 0.5, jnp.float32)
    for step in range(3):
        pos = jnp.full((2,), 12 + step, jnp.int32)
        kvm = jnp.broadcast_to(jnp.arange(16)[None, :] < 13 + step, (2, 16))
        cur = jnp.int32(12 + step)
        df, kvf, rf = llama_decode_step(params, cfg, tok, kvf, cur, pos, kvm,
                                        extract_layer=1)
        dq, kvq, rq = llama_decode_step(params, cfg, tok, kvq, cur, pos, kvm,
                                        extract_layer=1)
        assert isinstance(kvq, QuantKVCache)
        assert _cos(df, dq) > 0.999, (step, _cos(df, dq))
        assert _cos(rf, rq) > 0.999, (step, _cos(rf, rq))
        np.testing.assert_allclose(np.asarray(rq).sum(-1), 1.0, atol=1e-4)
        tok = jnp.asarray(rng.standard_normal((2, 1, 64)) * 0.5, jnp.float32)


def test_kv_quant_cache_is_smaller(tiny, rng):
    cfg, params = tiny
    embeds = jnp.asarray(rng.standard_normal((1, 8, 64)), jnp.float32)
    mask = jnp.ones((1, 8), bool)

    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(t))

    _, kvf, _ = llama_prefill(params, cfg, embeds, mask, max_seq=32)
    _, kvq, _ = llama_prefill(params, cfg, embeds, mask, max_seq=32,
                              kv_quant=True)
    # int8 values + one f32 scale per head_dim slot vs f32 values: at this
    # tiny head_dim=16 that's (16+4)/64 = 0.3125x; at the real 128 it's 0.26x
    assert nbytes(kvq) <= nbytes(kvf) * 0.3125, (nbytes(kvq), nbytes(kvf))


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

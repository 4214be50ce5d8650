"""Sequence-parallel (ring-attention) prefill parity vs `llama_prefill`.

The sp path shards the prompt's sequence dim across a mesh axis and runs
ring attention (`parallel/sp_prefill.py`); these tests pin exact behavior
parity — logits, KV cache contents, and the extract row — against the
single-device dense prefill on the 8-device CPU mesh, with and without
left padding, at several shard counts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from attwarp_tpu.models.llama import LlamaConfig, llama_prefill
from attwarp_tpu.parallel.sp_prefill import sp_prefill


def _params(cfg: LlamaConfig, seed=0):
    r = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, kvH, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    def lin(o, i):
        return jnp.asarray(r.standard_normal((o, i)) / np.sqrt(i), jnp.float32)

    return {
        "embed_tokens": jnp.asarray(
            r.standard_normal((cfg.vocab_size, D)) * 0.05, jnp.float32),
        "norm": jnp.ones((D,)),
        "layers": [
            {
                "q_proj": lin(H * hd, D), "k_proj": lin(kvH * hd, D),
                "v_proj": lin(kvH * hd, D), "o_proj": lin(D, D),
                "gate_proj": lin(I, D), "up_proj": lin(I, D),
                "down_proj": lin(D, I),
                "input_layernorm": jnp.ones((D,)),
                "post_attention_layernorm": jnp.ones((D,)),
            }
            for _ in range(cfg.num_hidden_layers)
        ],
    }


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
    )
    return cfg, _params(cfg)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


# Ring-attention shard_map programs compile slowly on the single-core CPU
# host (minutes per variant), so the default suite keeps ONE representative
# parity compile (n=2) and marks the rest `slow` (full suite: `-m ""`).
@pytest.mark.parametrize(
    "n",
    [2,
     pytest.param(4, marks=pytest.mark.slow),
     pytest.param(8, marks=pytest.mark.slow)],
)
def test_sp_matches_dense_no_padding(tiny, rng, n):
    cfg, params = tiny
    T, B = 16, 2
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((B, T), bool)
    ld, cd, rd = llama_prefill(params, cfg, embeds, mask, max_seq=24,
                               extract_layer=1)
    ls, cs, rs = sp_prefill(params, cfg, embeds, mask, _mesh(n), axis="sp",
                            max_seq=24, extract_layer=1)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs.k), np.asarray(cd.k),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs.v), np.asarray(cd.v),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sp_matches_dense_left_padding(tiny, rng):
    cfg, params = tiny
    T, B = 16, 3
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = np.ones((B, T), bool)
    mask[0, :5] = False
    mask[1, :11] = False          # pad crosses several shard boundaries
    mask = jnp.asarray(mask)
    ld, cd, rd = llama_prefill(params, cfg, embeds, mask, max_seq=16,
                               extract_layer=2)
    ls, cs, rs = sp_prefill(params, cfg, embeds, mask, _mesh(8), axis="sp",
                            max_seq=16, extract_layer=2)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)
    # cache parity on VALID positions (pad rows are garbage on both paths
    # but not necessarily the same garbage)
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(cs.k)[:, m], np.asarray(cd.k)[:, m],
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cs.v)[:, m], np.asarray(cd.v)[:, m],
        rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sp_multilayer_extract_and_no_extract(tiny, rng):
    cfg, params = tiny
    T, B = 8, 2
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((B, T), bool)
    ld, _, rd = llama_prefill(params, cfg, embeds, mask, max_seq=8,
                              extract_layer=(0, 2))
    ls, _, rs = sp_prefill(params, cfg, embeds, mask, _mesh(4), axis="sp",
                           max_seq=8, extract_layer=(0, 2))
    assert rs.shape == rd.shape == (2, B, cfg.num_attention_heads, T)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)
    ls2, _, r_none = sp_prefill(params, cfg, embeds, mask, _mesh(4),
                                axis="sp", max_seq=8)
    assert r_none is None
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)


def test_sp_rejects_indivisible_length(tiny, rng):
    cfg, params = tiny
    embeds = jnp.asarray(rng.standard_normal((1, 10, 64)), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        sp_prefill(params, cfg, embeds, jnp.ones((1, 10), bool), _mesh(4),
                   axis="sp")


@pytest.mark.slow
def test_sp_decode_continues_from_cache(tiny, rng):
    """The sp cache is consumed by the existing decode step unchanged."""
    from attwarp_tpu.models.llama import llama_decode_step

    cfg, params = tiny
    T, B = 16, 2
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((B, T), bool)
    ld, cd, _ = llama_prefill(params, cfg, embeds, mask, max_seq=20)
    ls, cs, _ = sp_prefill(params, cfg, embeds, mask, _mesh(4), axis="sp",
                           max_seq=20)
    tok_d = jnp.argmax(ld, -1)
    tok_s = jnp.argmax(ls, -1)
    np.testing.assert_array_equal(np.asarray(tok_d), np.asarray(tok_s))
    emb_d = params["embed_tokens"][tok_d][:, None, :]
    pos = jnp.full((B,), T, jnp.int32)
    kv_mask = (jnp.arange(20)[None, :] <= T)
    kv_mask = jnp.broadcast_to(kv_mask, (B, 20))
    ld2, _, _ = llama_decode_step(params, cfg, emb_d, cd,
                                  jnp.asarray(T), pos, kv_mask)
    ls2, _, _ = llama_decode_step(params, cfg, emb_d, cs,
                                  jnp.asarray(T), pos, kv_mask)
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(ld2),
                               rtol=1e-5, atol=1e-5)


# ── Qwen2-VL family ─────────────────────────────────────────────────────


def _qwen_params(cfg, seed=0):
    r = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, kvH, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    def lin(o, i):
        return jnp.asarray(r.standard_normal((o, i)) / np.sqrt(i), jnp.float32)

    def linb(o, i):
        return {"weight": lin(o, i),
                "bias": jnp.asarray(r.standard_normal((o,)) * 0.02,
                                    jnp.float32)}

    return {
        "embed_tokens": jnp.asarray(
            r.standard_normal((cfg.vocab_size, D)) * 0.05, jnp.float32),
        "norm": jnp.ones((D,)),
        "layers": [
            {
                "q_proj": linb(H * hd, D), "k_proj": linb(kvH * hd, D),
                "v_proj": linb(kvH * hd, D), "o_proj": lin(D, D),
                "gate_proj": lin(I, D), "up_proj": lin(I, D),
                "down_proj": lin(D, I),
                "input_layernorm": jnp.ones((D,)),
                "post_attention_layernorm": jnp.ones((D,)),
            }
            for _ in range(cfg.num_hidden_layers)
        ],
    }


@pytest.fixture(scope="module")
def tiny_qwen():
    from attwarp_tpu.models.qwen2vl import Qwen2VLTextConfig

    cfg = Qwen2VLTextConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        mrope_section=(2, 3, 3),
    )
    return cfg, _qwen_params(cfg)


def _mrope_tables(cfg, mask, rng):
    """Synthetic 3-stream M-RoPE positions (text ramp + a 2D vision patch
    pattern mid-prompt) -> the (B, T, hd) cos/sin the prefill contract takes."""
    from attwarp_tpu.models.qwen2vl import mrope_cos_sin

    B, T = mask.shape
    pos = np.tile(np.arange(T, dtype=np.int64), (3, B, 1))
    mid = slice(T // 4, T // 4 + 4)
    pos[1, :, mid] = pos[0, :, mid] // 2      # h stream diverges
    pos[2, :, mid] = pos[0, :, mid] % 3       # w stream diverges
    return mrope_cos_sin(jnp.asarray(pos), cfg)


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4])
def test_sp_qwen_matches_dense(tiny_qwen, rng, n):
    from attwarp_tpu.models.qwen2vl import qwen2vl_prefill
    from attwarp_tpu.parallel.sp_prefill import sp_prefill_qwen

    cfg, params = tiny_qwen
    T, B = 16, 2
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((B, T), bool)
    cos, sin = _mrope_tables(cfg, mask, rng)
    ld, (kd, vd), rd = qwen2vl_prefill(params, cfg, embeds, mask, cos, sin,
                                       max_seq=24, extract_layer=1)
    ls, (ks, vs), rs = sp_prefill_qwen(params, cfg, embeds, mask, cos, sin,
                                       _mesh(n), axis="sp", max_seq=24,
                                       extract_layer=1)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(kd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sp_qwen_left_padding_and_decode(tiny_qwen, rng):
    from attwarp_tpu.models.qwen2vl import qwen2vl_decode_step, qwen2vl_prefill
    from attwarp_tpu.parallel.sp_prefill import sp_prefill_qwen

    cfg, params = tiny_qwen
    T, B, S = 16, 3, 20
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = np.ones((B, T), bool)
    mask[0, :5] = False
    mask[1, :11] = False          # pad crosses shard boundaries at n=8
    maskj = jnp.asarray(mask)
    cos, sin = _mrope_tables(cfg, maskj, rng)
    ld, cd, rd = qwen2vl_prefill(params, cfg, embeds, maskj, cos, sin,
                                 max_seq=S, extract_layer=2)
    ls, cs, rs = sp_prefill_qwen(params, cfg, embeds, maskj, cos, sin,
                                 _mesh(8), axis="sp", max_seq=S,
                                 extract_layer=2)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cs[0])[:, :, :T][:, mask],
        np.asarray(cd[0])[:, :, :T][:, mask], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cs[1])[:, :, :T][:, mask],
        np.asarray(cd[1])[:, :, :T][:, mask], rtol=1e-5, atol=1e-5)

    # the sp cache continues through the existing decode step identically;
    # the new token's position continues the SAME absolute arange(T) stream
    # the prefill tables were built from (position T follows position T-1)
    tok = jnp.argmax(ls, -1)
    emb_tok = params["embed_tokens"][tok][:, None, :]
    pos_new = jnp.full((3, B, 1), T, jnp.int32)
    from attwarp_tpu.models.qwen2vl import mrope_cos_sin

    cos1, sin1 = mrope_cos_sin(pos_new, cfg)
    kv_mask = np.zeros((B, S), bool)
    kv_mask[:, :T] = mask
    kv_mask[:, T] = True
    kvm = jnp.asarray(kv_mask)
    ld2, _, _ = qwen2vl_decode_step(params, cfg, emb_tok, cd,
                                    jnp.asarray(T), cos1, sin1, kvm)
    ls2, _, _ = qwen2vl_decode_step(params, cfg, emb_tok, cs,
                                    jnp.asarray(T), cos1, sin1, kvm)
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(ld2),
                               rtol=1e-5, atol=1e-5)


def test_sp_rejects_too_small_max_seq(tiny, rng):
    """max_seq < T is a contract error raised up front, not a cryptic
    negative-padding failure inside jnp.pad (advisor finding, round 3)."""
    cfg, params = tiny
    embeds = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
    with pytest.raises(ValueError, match="max_seq"):
        sp_prefill(params, cfg, embeds, jnp.ones((1, 16), bool), _mesh(4),
                   axis="sp", max_seq=8)


@pytest.mark.slow
def test_sp_kv_quant_matches_dense_quant(tiny, rng):
    """kv_quant=True returns a QuantKVCache identical to quantizing the
    dense prefill's cache: per-(token, head) scales never cross a shard
    boundary, so in-shard quantization is exact."""
    from attwarp_tpu.models.llama import QuantKVCache, llama_prefill

    cfg, params = tiny
    T, B = 16, 2
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((B, T), bool)
    ld, cd, _ = llama_prefill(params, cfg, embeds, mask, max_seq=24,
                              kv_quant=True)
    ls, cs, _ = sp_prefill(params, cfg, embeds, mask, _mesh(4), axis="sp",
                           max_seq=24, kv_quant=True)
    assert isinstance(cs, QuantKVCache)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
    # int8 codes may differ by 1 LSB where the f32 ring-vs-dense values
    # straddle a rounding boundary; compare the dequantized values
    deq_s = np.asarray(cs.k_q, np.float32) * np.asarray(cs.k_s)[..., None]
    deq_d = np.asarray(cd.k_q, np.float32) * np.asarray(cd.k_s)[..., None]
    np.testing.assert_allclose(deq_s[:, :, :T], deq_d[:, :, :T], atol=1e-3)


@pytest.mark.slow
def test_sp_qwen_kv_quant_decodes(tiny_qwen, rng):
    """Qwen kv_quant cache feeds qwen2vl_decode_step like the dense-path
    QuantKVCache (serving drop-in; advisor finding, round 3)."""
    from attwarp_tpu.models.llama import QuantKVCache
    from attwarp_tpu.models.qwen2vl import (
        mrope_cos_sin, qwen2vl_decode_step, qwen2vl_prefill)
    from attwarp_tpu.parallel.sp_prefill import sp_prefill_qwen

    cfg, params = tiny_qwen
    T, B, S = 16, 2, 20
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((B, T), bool)
    cos, sin = _mrope_tables(cfg, mask, rng)
    ld, cd, _ = qwen2vl_prefill(params, cfg, embeds, mask, cos, sin,
                                max_seq=S, kv_quant=True)
    ls, cs, _ = sp_prefill_qwen(params, cfg, embeds, mask, cos, sin,
                                _mesh(4), axis="sp", max_seq=S,
                                kv_quant=True)
    assert isinstance(cs, QuantKVCache)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
    tok = jnp.argmax(ls, -1)
    emb_tok = params["embed_tokens"][tok][:, None, :]
    cos1, sin1 = mrope_cos_sin(jnp.full((3, B, 1), T, jnp.int32), cfg)
    kv_mask = np.zeros((B, S), bool)
    kv_mask[:, : T + 1] = True
    kvm = jnp.asarray(kv_mask)
    ld2, _, _ = qwen2vl_decode_step(params, cfg, emb_tok, cd,
                                    jnp.asarray(T), cos1, sin1, kvm)
    ls2, _, _ = qwen2vl_decode_step(params, cfg, emb_tok, cs,
                                    jnp.asarray(T), cos1, sin1, kvm)
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(ld2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sp_composes_with_int8_weights(tiny, rng):
    """w8a8 decoder linears ride through the ring unchanged: activation
    quantization is per-token (last axis), so sharding the sequence dim
    changes no quantization group; only the streaming-softmax f32
    reassociation differs from dense."""
    from attwarp_tpu.numerics.quant import quantize_decoder_params

    cfg, params = tiny
    qp = quantize_decoder_params(params)
    T, B = 16, 2
    embeds = jnp.asarray(rng.standard_normal((B, T, 64)) * 0.5, jnp.float32)
    mask = jnp.ones((B, T), bool)
    ld, cd, rd = llama_prefill(qp, cfg, embeds, mask, max_seq=16,
                               extract_layer=1)
    ls, cs, rs = sp_prefill(qp, cfg, embeds, mask, _mesh(4), axis="sp",
                            max_seq=16, extract_layer=1)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ld),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cs.k), np.asarray(cd.k),
                               rtol=1e-4, atol=1e-4)

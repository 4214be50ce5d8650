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


@pytest.mark.parametrize("n", [2, 4, 8])
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

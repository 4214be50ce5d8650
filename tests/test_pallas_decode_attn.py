"""Pallas decode-attention (int8 cache) parity vs the XLA factored form.

``ops/pallas_decode_attn.py`` is the serving decode's cache read at B<=16:
one int8 stream from HBM with widen/scale/softmax/PV fused on-chip, replacing
``models/llama.py::_attn_quantcache`` (whose einsums re-read or widen the
cache). Reference semantics being preserved: the decode read of
torch.scaled_dot_product_attention in the vendored LLaVA
(SURVEY §2 C5-C7 context; the reference has no quantized cache at all, so
the *numerical contract* here is our own `_attn_quantcache`, which the
round-2 greedy-parity tests already pinned against the dense cache).

On CPU the kernel runs under the Mosaic TPU interpreter. Per CLAUDE.md's
suite-hang rule, every interpret-mode computation is ONE jitted dispatch,
blocked before anything else dispatches.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from attwarp_tpu.models.llama import LlamaConfig, _attn_quantcache
from attwarp_tpu.ops.pallas_decode_attn import (
    _seq_tile,
    decode_attn_quantcache,
    decode_attn_supported,
)


def _case(B, S, H, kvH, hd=128, seed=0, pad=None):
    rng = np.random.default_rng(seed)
    k_q = jnp.asarray(rng.integers(-127, 128, (B, S, kvH, hd)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, (B, S, kvH, hd)), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.5, 1.5, (B, S, kvH)) / 127, jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.5, 1.5, (B, S, kvH)) / 127, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.bfloat16)
    mask = np.ones((B, S), bool)
    if pad:  # left padding per sample (serving bucket convention)
        for b, p in enumerate(pad):
            mask[b, :p] = False
    return q, k_q, k_s, v_q, v_s, jnp.asarray(mask)


def _pair(B, S, H, kvH, hd=128, pad=None):
    q, k_q, k_s, v_q, v_s, mask = _case(B, S, H, kvH, hd, pad=pad)
    cfg = LlamaConfig(
        vocab_size=32, hidden_size=H * hd, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=H, num_key_value_heads=kvH,
    )
    scale = 1.0 / np.sqrt(hd)
    ref, _ = _attn_quantcache(
        q, k_q, k_s, v_q, v_s, mask[:, None, :], cfg, want_probs=False
    )
    fn = jax.jit(partial(
        decode_attn_quantcache, num_heads=H, sm_scale=scale))
    with pltpu.force_tpu_interpret_mode():
        got = jax.block_until_ready(fn(q, k_q, k_s, v_q, v_s, mask))
    return np.asarray(ref, np.float32), np.asarray(got, np.float32)


def test_parity_mha():
    """MHA geometry (LLaVA-1.5: kvH == H), single seq tile."""
    ref, got = _pair(B=2, S=64, H=2, kvH=2)
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=2e-2, rtol=0)
    # bf16 q.k product: tolerance is the XLA form's own dtype ladder, so
    # agreement should be much tighter than the assert — check cosine too
    cos = np.sum(ref.reshape(got.shape) * got) / (
        np.linalg.norm(ref) * np.linalg.norm(got) + 1e-30)
    assert cos > 0.9999


def test_parity_gqa_multitile():
    """GQA (n_rep=2) across multiple sequence tiles with online softmax."""
    ref, got = _pair(B=2, S=512, H=4, kvH=2)
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=2e-2, rtol=0)


def test_parity_left_padded_first_tile_fully_masked():
    """A fully-masked leading tile (left-padded serving buckets: starts[b]
    slots are invalid) must be annihilated by the online-softmax rescale —
    the classic flash-decoding poisoned-l bug this kernel must not have."""
    ref, got = _pair(B=3, S=512, H=2, kvH=2, pad=[300, 0, 511])
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=2e-2, rtol=0)


def test_supported_gate(monkeypatch):
    """Static gate: 64-multiple cache sizes pass; head_dim must be 128;
    batch capped at 16 (the kernel's measured win region — B>=24 collapses
    to ~180 GiB/s, tools/bench_attn_forms.py); CPU backend opts out unless
    ATTWARP_PALLAS_DECODE=1 (Mosaic kernels need the interpreter there)."""
    assert not decode_attn_supported(640, 32, 128, 16)  # cpu backend: off
    monkeypatch.setenv("ATTWARP_PALLAS_DECODE", "1")
    assert decode_attn_supported(640, 32, 128, 16)
    assert decode_attn_supported(672, 32, 128, 8)    # 672 = 21*32
    assert decode_attn_supported(1024, 4, 128, 1)
    assert not decode_attn_supported(640, 32, 64, 16)
    assert not decode_attn_supported(100, 32, 128, 16)  # no 32-mult divisor
    assert not decode_attn_supported(672, 32, 128, 24)  # out of win region
    assert not decode_attn_supported(672, 32, 128, 32)
    assert _seq_tile(640) == 160                  # largest 32-mult divisor
    assert _seq_tile(100) == 0                    # 100 itself is off-grid
    assert _seq_tile(512) == 256


def test_decode_step_routes_through_kernel(monkeypatch):
    """llama_decode_step at B>=16 with a quant cache and a supported shape
    must call the Pallas kernel (and produce logits matching the XLA form)."""
    from attwarp_tpu.models import llama as llama_mod
    from attwarp_tpu.models.llama import QuantKVCache, llama_decode_step
    from tests.test_flash_prefill import _llama_params

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=256, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    params = _llama_params(cfg)
    rng = np.random.default_rng(7)
    B, S, kvH, hd = 16, 64, cfg.kv_heads, cfg.head_dim
    kv = QuantKVCache(
        jnp.asarray(rng.integers(-127, 128, (1, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (1, B, S, kvH)) / 127, jnp.float32),
        jnp.asarray(rng.integers(-127, 128, (1, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (1, B, S, kvH)) / 127, jnp.float32),
    )
    emb = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)) * 0.1,
                      jnp.float32)
    args = (params, cfg, emb, kv, jnp.asarray(10), jnp.full((B,), 10),
            jnp.asarray(np.arange(S)[None] <= 10).repeat(B, 0))

    monkeypatch.setenv("ATTWARP_PALLAS_DECODE", "1")
    calls = []
    real = llama_mod.decode_attn_quantcache

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(llama_mod, "decode_attn_quantcache", spy)
    step = jax.jit(lambda *a: llama_decode_step(*a), static_argnums=(1,))
    with pltpu.force_tpu_interpret_mode():
        logits, _, _ = jax.block_until_ready(step(*args))
    assert calls, "B>=16 quant decode did not route through the Pallas kernel"

    # XLA reference path: force the kernel off via the supported gate
    monkeypatch.setattr(llama_mod, "decode_attn_supported",
                        lambda *a: False)
    logits_ref, _, _ = jax.block_until_ready(
        jax.jit(lambda *a: llama_decode_step(*a), static_argnums=(1,))(*args))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=5e-3, rtol=0)


def test_qwen_decode_step_routes_through_kernel(monkeypatch):
    """qwen2vl_decode_step with a quant cache and a supported shape must
    route non-extract layers through the kernel (GQA n_rep=2 here) and
    match the XLA ladder's logits."""
    from attwarp_tpu.models import qwen2vl as qwen_mod
    from attwarp_tpu.models.llama import QuantKVCache
    from attwarp_tpu.models.qwen2vl import (
        Qwen2VLTextConfig,
        mrope_cos_sin,
        qwen2vl_decode_step,
    )

    monkeypatch.setenv("ATTWARP_PALLAS_DECODE", "1")
    cfg = Qwen2VLTextConfig(
        vocab_size=64, hidden_size=256, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
    )
    assert cfg.head_dim == 128
    rng = np.random.default_rng(11)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    D, I = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.kv_heads * cfg.head_dim
    params = {
        "embed_tokens": r(cfg.vocab_size, D),
        "norm": jnp.ones(D),
        "layers": [{
            "input_layernorm": jnp.ones(D),
            "post_attention_layernorm": jnp.ones(D),
            "q_proj": r(D, D), "k_proj": r(kvd, D), "v_proj": r(kvd, D),
            "o_proj": r(D, D),
            "gate_proj": r(I, D), "up_proj": r(I, D), "down_proj": r(D, I),
        }],
    }
    B, S, kvH, hd = 16, 64, cfg.kv_heads, cfg.head_dim
    kv = QuantKVCache(
        jnp.asarray(rng.integers(-127, 128, (1, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (1, B, S, kvH)) / 127, jnp.float32),
        jnp.asarray(rng.integers(-127, 128, (1, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (1, B, S, kvH)) / 127, jnp.float32),
    )
    emb = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.1, jnp.float32)
    pos3 = jnp.broadcast_to(jnp.full((B, 1), 10)[None], (3, B, 1))
    cos, sin = mrope_cos_sin(pos3, cfg)
    args = (params, cfg, emb, kv, jnp.asarray(10), cos, sin,
            jnp.asarray(np.arange(S)[None] <= 10).repeat(B, 0))

    calls = []
    real = qwen_mod.decode_attn_quantcache

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(qwen_mod, "decode_attn_quantcache", spy)
    step = jax.jit(lambda *a: qwen2vl_decode_step(*a), static_argnums=(1,))
    with pltpu.force_tpu_interpret_mode():
        logits, _, _ = jax.block_until_ready(step(*args))
    assert calls, "qwen quant decode did not route through the Pallas kernel"

    monkeypatch.setattr(qwen_mod, "decode_attn_supported", lambda *a: False)
    logits_ref, _, _ = jax.block_until_ready(
        jax.jit(lambda *a: qwen2vl_decode_step(*a), static_argnums=(1,))(*args))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=5e-3, rtol=0)


def test_engine_step_kernel_parity(monkeypatch):
    """ServeEngine's per-slot _step (left-padded buckets, per-slot rope
    positions) routes through the kernel and matches the XLA ladder."""
    from attwarp_tpu.models.llama import QuantKVCache
    from attwarp_tpu.serving import engine as eng_mod
    from tests.test_flash_prefill import _llama_params

    monkeypatch.setenv("ATTWARP_PALLAS_DECODE", "1")
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=256, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    params = _llama_params(cfg)
    rng = np.random.default_rng(13)
    B, S, kvH, hd = 16, 64, cfg.kv_heads, cfg.head_dim
    kv = QuantKVCache(
        jnp.asarray(rng.integers(-127, 128, (1, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (1, B, S, kvH)) / 127, jnp.float32),
        jnp.asarray(rng.integers(-127, 128, (1, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (1, B, S, kvH)) / 127, jnp.float32),
    )
    tokens = jnp.asarray(rng.integers(1, 63, (B,)), jnp.int32)
    starts = jnp.asarray(rng.integers(0, 8, (B,)), jnp.int32)
    cur_lens = starts + jnp.asarray(rng.integers(5, 40, (B,)), jnp.int32)

    calls = []
    real = eng_mod.decode_attn_quantcache

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(eng_mod, "decode_attn_quantcache", spy)
    step = jax.jit(lambda *a: eng_mod._step(*a), static_argnums=(1,))
    with pltpu.force_tpu_interpret_mode():
        logits, _ = jax.block_until_ready(
            step(params, cfg, tokens, kv, cur_lens, starts))
    assert calls, "engine _step did not route through the Pallas kernel"

    monkeypatch.setattr(eng_mod, "decode_attn_supported", lambda *a: False)
    logits_ref, _ = jax.block_until_ready(
        jax.jit(lambda *a: eng_mod._step(*a), static_argnums=(1,))(
            params, cfg, tokens, kv, cur_lens, starts))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=5e-3, rtol=0)

"""Pallas decode-attention (int8 cache) parity vs the XLA factored form.

``ops/pallas_decode_attn.py`` is the decode cache read in the kernel's win
region: one int8 stream from HBM with widen/scale/softmax/PV fused on-chip,
replacing ``models/llama.py::_attn_quantcache`` (whose einsums re-read or
widen the cache). The kernel reads the STEP-ENTRY cache and the current
token is merged outside (see the module docstring's lessons), so parity
here is: kernel(stale cache, token) == XLA ladder(post-update cache).
Reference semantics being preserved: the decode read of
torch.scaled_dot_product_attention in the vendored LLaVA (SURVEY §2 C5-C7
context; the reference has no quantized cache at all, so the *numerical
contract* here is our own `_attn_quantcache`, which the round-2
greedy-parity tests already pinned against the dense cache).

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
    prepare_decode_attn_operands,
)


def _case(L, B, S, H, kvH, hd=128, seed=0, cur=None, pad=None):
    """Random stale cache + current token. ``cur[b]`` is where the token
    would be written; valid history is [pad[b], cur[b]) per sample."""
    rng = np.random.default_rng(seed)
    k_q = jnp.asarray(rng.integers(-127, 128, (L, B, S, kvH, hd)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, (L, B, S, kvH, hd)), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.5, 1.5, (L, B, S, kvH)) / 127, jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.5, 1.5, (L, B, S, kvH)) / 127, jnp.float32)
    k1_q = jnp.asarray(rng.integers(-127, 128, (B, 1, kvH, hd)), jnp.int8)
    v1_q = jnp.asarray(rng.integers(-127, 128, (B, 1, kvH, hd)), jnp.int8)
    k1_s = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, kvH)) / 127, jnp.float32)
    v1_s = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, kvH)) / 127, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.bfloat16)
    cur = np.full((B,), S - 1) if cur is None else np.asarray(cur)
    pad = np.zeros((B,), int) if pad is None else np.asarray(pad)
    ar = np.arange(S)[None, :]
    strict = (ar >= pad[:, None]) & (ar < cur[:, None])     # history only
    return (q, k_q, k_s, v_q, v_s, k1_q, k1_s, v1_q, v1_s,
            jnp.asarray(strict), cur, pad)


def _pair(L, B, S, H, kvH, hd=128, layer=0, cur=None, pad=None, seed=0):
    (q, k_q, k_s, v_q, v_s, k1_q, k1_s, v1_q, v1_s,
     strict, cur, pad) = _case(L, B, S, H, kvH, hd, seed, cur, pad)
    cfg = LlamaConfig(
        vocab_size=32, hidden_size=H * hd, intermediate_size=64,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=kvH,
    )
    scale = 1.0 / np.sqrt(hd)

    # reference: XLA ladder on the POST-update plane (token written at cur)
    bi = np.arange(B)
    kq_full = k_q[layer].at[bi, cur].set(k1_q[:, 0])
    ks_full = k_s[layer].at[bi, cur].set(k1_s[:, 0])
    vq_full = v_q[layer].at[bi, cur].set(v1_q[:, 0])
    vs_full = v_s[layer].at[bi, cur].set(v1_s[:, 0])
    ar = np.arange(S)[None, :]
    full_mask = jnp.asarray(np.asarray(strict) | (ar == cur[:, None]))
    ref, _ = _attn_quantcache(
        q, kq_full, ks_full, vq_full, vs_full, full_mask[:, None, :], cfg,
        want_probs=False,
    )

    def run(q, k_q, k_s, v_q, v_s, k1_q, k1_s, v1_q, v1_s, strict):
        ksx, vsx, bias = prepare_decode_attn_operands(k_s, v_s, strict)
        return decode_attn_quantcache(
            q, k_q, ksx, v_q, vsx, bias, k1_q, k1_s, v1_q, v1_s,
            num_heads=H, sm_scale=scale, layer=layer,
        )

    fn = jax.jit(run)
    with pltpu.force_tpu_interpret_mode():
        got = jax.block_until_ready(
            fn(q, k_q, k_s, v_q, v_s, k1_q, k1_s, v1_q, v1_s, strict))
    return np.asarray(ref, np.float32), np.asarray(got, np.float32)


def test_parity_mha():
    """MHA geometry (LLaVA-1.5: kvH == H), single seq tile."""
    ref, got = _pair(L=1, B=2, S=64, H=2, kvH=2)
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=2e-2, rtol=0)
    # bf16 q.k product: tolerance is the XLA form's own dtype ladder, so
    # agreement should be much tighter than the assert — check cosine too
    cos = np.sum(ref.reshape(got.shape) * got) / (
        np.linalg.norm(ref) * np.linalg.norm(got) + 1e-30)
    assert cos > 0.9999


def test_parity_gqa_multitile():
    """GQA (n_rep=2) across multiple sequence tiles with online softmax."""
    ref, got = _pair(L=1, B=2, S=512, H=4, kvH=2)
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=2e-2, rtol=0)


def test_parity_layer_indexed():
    """The static ``layer`` index selects the right plane of the whole
    (L, ...) cache (the BlockSpec index maps — slicing the operand instead
    is the copy pathology the module docstring records)."""
    ref, got = _pair(L=3, B=2, S=128, H=4, kvH=2, layer=1, seed=3)
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=2e-2, rtol=0)


def test_parity_left_padded_and_short_history():
    """Left-padded serving buckets (starts[b] slots invalid) and a slot
    with EMPTY history (cur == pad: only the current token attends) — the
    classic flash-decoding poisoned-l bug this kernel must not have: a
    fully-masked tile contributes exp(0)=1 rows that the next rescale (or
    the external merge) must annihilate."""
    ref, got = _pair(L=1, B=3, S=512, H=2, kvH=2,
                     cur=[400, 511, 300], pad=[300, 0, 300])
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=2e-2, rtol=0)


def test_supported_gate(monkeypatch):
    """Static gate: 64-multiple cache sizes pass; head_dim must be 128;
    no batch bound (v2 bandwidth scales monotonically with B); CPU backend
    opts out unless ATTWARP_PALLAS_DECODE=1 (Mosaic kernels need the
    interpreter there)."""
    assert not decode_attn_supported(640, 32, 128, 16)  # cpu backend: off
    monkeypatch.setenv("ATTWARP_PALLAS_DECODE", "1")
    assert decode_attn_supported(640, 32, 128, 16)
    assert decode_attn_supported(672, 32, 128, 8)    # 672 = 21*32
    assert decode_attn_supported(1024, 4, 128, 1)
    assert decode_attn_supported(672, 32, 128, 24)
    assert decode_attn_supported(672, 32, 128, 32)
    assert not decode_attn_supported(640, 32, 64, 16)
    assert not decode_attn_supported(100, 32, 128, 16)  # no 32-mult divisor
    assert _seq_tile(640) == 160                  # largest 32-mult divisor
    assert _seq_tile(100) == 0                    # 100 itself is off-grid
    assert _seq_tile(512) == 256
    # kvH-aware byte-target cap (round 4): GQA's small kv-head counts get
    # proportionally longer token tiles so the per-grid-step DMA stays
    # ~2 MB (Qwen2-VL kvH=4: whole 704-slot sequence in one step)
    assert _seq_tile(704, 32) == 64               # LLaVA: old cap holds
    assert _seq_tile(704, 4) == 704
    assert _seq_tile(832, 4) == 832
    assert _seq_tile(4096, 4) == 2048             # hard cap at 2048 tokens


def test_decode_step_routes_through_kernel(monkeypatch):
    """llama_decode_step with a quant cache and a supported shape must call
    the Pallas kernel for every non-extract layer AND produce logits + an
    updated cache matching the XLA ladder (the deferred batched append)."""
    from attwarp_tpu.models import llama as llama_mod
    from attwarp_tpu.models.llama import QuantKVCache, llama_decode_step
    from tests.test_flash_prefill import _llama_params

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=256, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
    )
    params = _llama_params(cfg)
    rng = np.random.default_rng(7)
    L, B, S, kvH, hd = 2, 16, 64, cfg.kv_heads, cfg.head_dim
    kv = QuantKVCache(
        jnp.asarray(rng.integers(-127, 128, (L, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (L, B, S, kvH)) / 127, jnp.float32),
        jnp.asarray(rng.integers(-127, 128, (L, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (L, B, S, kvH)) / 127, jnp.float32),
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
        logits, kv_new, _ = jax.block_until_ready(step(*args))
    assert len(calls) == L, "every layer should route through the kernel"

    # XLA reference path: force the kernel off via the supported gate
    monkeypatch.setattr(llama_mod, "decode_attn_supported",
                        lambda *a: False)
    logits_ref, kv_ref, _ = jax.block_until_ready(
        jax.jit(lambda *a: llama_decode_step(*a), static_argnums=(1,))(*args))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=5e-3, rtol=0)
    # the deferred batched append writes what the ladder wrote (layer>0
    # K/V derive from the previous layer's attn output, which differs in
    # low bits between the two paths -> quantization may round +-1)
    for got_c, ref_c in zip(kv_new, kv_ref):
        g, r = np.asarray(got_c), np.asarray(ref_c)
        if g.dtype == np.int8:
            assert np.abs(g.astype(int) - r.astype(int)).max() <= 1
        else:
            np.testing.assert_allclose(g, r, atol=1e-4, rtol=1e-3)


def test_decode_step_extract_layer_keeps_probs(monkeypatch):
    """An extract layer inside a kernel step still yields its probs row
    (the XLA form on that layer's post-update plane), identical to the
    gate-off ladder's."""
    from attwarp_tpu.models import llama as llama_mod
    from attwarp_tpu.models.llama import QuantKVCache, llama_decode_step
    from tests.test_flash_prefill import _llama_params

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=256, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
    )
    params = _llama_params(cfg)
    rng = np.random.default_rng(9)
    L, B, S, kvH, hd = 2, 16, 64, cfg.kv_heads, cfg.head_dim
    kv = QuantKVCache(
        jnp.asarray(rng.integers(-127, 128, (L, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (L, B, S, kvH)) / 127, jnp.float32),
        jnp.asarray(rng.integers(-127, 128, (L, B, S, kvH, hd)), jnp.int8),
        jnp.asarray(rng.uniform(0.5, 1.5, (L, B, S, kvH)) / 127, jnp.float32),
    )
    emb = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)) * 0.1,
                      jnp.float32)
    args = (params, cfg, emb, kv, jnp.asarray(10), jnp.full((B,), 10),
            jnp.asarray(np.arange(S)[None] <= 10).repeat(B, 0), 1)

    monkeypatch.setenv("ATTWARP_PALLAS_DECODE", "1")
    step = jax.jit(lambda *a: llama_decode_step(*a), static_argnums=(1, 7))
    with pltpu.force_tpu_interpret_mode():
        logits, _, row = jax.block_until_ready(step(*args))
    assert row is not None and row.shape == (B, cfg.num_attention_heads, S)

    from attwarp_tpu.models import llama as llama_mod2
    monkeypatch.setattr(llama_mod2, "decode_attn_supported",
                        lambda *a: False)
    logits_ref, _, row_ref = jax.block_until_ready(
        jax.jit(lambda *a: llama_decode_step(*a),
                static_argnums=(1, 7))(*args))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=5e-3, rtol=0)
    # the extract layer sits after a kernel layer, whose output differs
    # from the ladder's in low bits -> small probs drift is expected
    np.testing.assert_allclose(np.asarray(row), np.asarray(row_ref),
                               atol=1e-3, rtol=0)


def test_qwen_decode_step_routes_through_kernel(monkeypatch):
    """qwen2vl_decode_step with a quant cache and a supported shape must
    route through the kernel (GQA n_rep=2 here) and match the XLA ladder's
    logits and appended cache."""
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
        logits, kv_new, _ = jax.block_until_ready(step(*args))
    assert calls, "qwen quant decode did not route through the Pallas kernel"

    monkeypatch.setattr(qwen_mod, "decode_attn_supported", lambda *a: False)
    logits_ref, kv_ref, _ = jax.block_until_ready(
        jax.jit(lambda *a: qwen2vl_decode_step(*a), static_argnums=(1,))(*args))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=5e-3, rtol=0)
    for got_c, ref_c in zip(kv_new, kv_ref):
        g, r = np.asarray(got_c), np.asarray(ref_c)
        if g.dtype == np.int8:
            assert np.abs(g.astype(int) - r.astype(int)).max() <= 1
        else:
            np.testing.assert_allclose(g, r, atol=1e-4, rtol=1e-3)


def test_engine_step_kernel_parity(monkeypatch):
    """ServeEngine's per-slot _step (left-padded buckets, per-slot rope
    positions, per-slot deferred append) routes through the kernel and
    matches the XLA ladder — logits AND the scattered cache writes."""
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
    step = jax.jit(lambda *a: eng_mod._step(*a)[:2], static_argnums=(1,))
    with pltpu.force_tpu_interpret_mode():
        logits, kv_new = jax.block_until_ready(
            step(params, cfg, tokens, kv, cur_lens, starts))
    assert calls, "engine _step did not route through the Pallas kernel"

    monkeypatch.setattr(eng_mod, "decode_attn_supported", lambda *a: False)
    logits_ref, kv_ref = jax.block_until_ready(
        jax.jit(lambda *a: eng_mod._step(*a)[:2], static_argnums=(1,))(
            params, cfg, tokens, kv, cur_lens, starts))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=5e-3, rtol=0)
    for got_c, ref_c in zip(kv_new, kv_ref):
        g, r = np.asarray(got_c), np.asarray(ref_c)
        if g.dtype == np.int8:
            assert np.abs(g.astype(int) - r.astype(int)).max() <= 1
        else:
            np.testing.assert_allclose(g, r, atol=1e-4, rtol=1e-3)

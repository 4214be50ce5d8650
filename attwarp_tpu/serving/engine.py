"""Continuous-batching serving engine for the JAX MLLMs.

The reference has no serving path at all (its batched driver processes one
fixed batch end to end, ``attention_extraction/functions.py:188-328``); this
is the TPU-native production counterpart: a fixed pool of ``slots`` decodes
in lock-step through ONE jitted step while requests stream in and out —
a finished slot is refilled from the queue on the next tick, so short
answers never hold up long ones (continuous batching).

Design (single chip; params may be TP-sharded — the step inherits their
shardings like every other jitted consumer):

- **Slot cache**: one ``(L, B_slots, max_seq, kvH, hd)`` KV cache (dense or
  int8 via ``kv_quant``). Each prompt is left-padded inside its 64-token
  length bucket: cache positions ``[0, start)`` hold masked padding,
  ``[start, cur_len)`` the prompt, and rope positions are
  ``cur_len - start`` (cache position minus the pad offset) — see
  ``_prefill_group`` / ``_prefill_qwen_group``.
- **Admission**: queued requests are BATCHED by (64-token length bucket,
  pixel shape) and prefilled together (one compilation per (bucket,
  power-of-two group size), groups capped at ``admit_batch``); the K/V
  blocks are inserted into free slots in one dispatch and the first
  generated tokens come from the prefill logits. Both families batch:
  Qwen2-VL's equal-pixel-shape grouping guarantees equal vision grids, so
  one static grid serves the vmapped vision tower and the shared M-RoPE
  structure, while rope deltas stay per-request.
- **Step**: one jit advances every slot: per-slot rope position and
  per-slot cache write position (vmapped ``dynamic_update_slice``), masked
  attention over each slot's own prefix, greedy argmax. Inactive slots
  compute garbage that is never read.
- **Harvest**: a slot retires on EOS or its request's ``max_new_tokens``.

Extraction is deliberately out of scope — serving answers questions
(the eval/answering path); attention extraction uses the batched
``generate_with_attention`` pipeline.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.models.llama import (
    LlamaConfig,
    LlamaKVCache,
    QuantKVCache,
    _attn,
    _attn_quantcache,
    apply_rope,
    init_kv_cache,
    init_quant_kv_cache,
    llama_prefill,
    make_decode_prep,
    rms_norm,
    rope_cos_sin,
)
from attwarp_tpu.numerics.quant import apply_linear, dequantize_kv, lm_logits, quantize_kv
from attwarp_tpu.ops.pallas_decode_attn import (
    decode_attn_bias,
    decode_attn_quantcache,
    decode_attn_supported,
    prepare_decode_attn_operands,
)


def _upd_prep_slots(flat, new_per_layer, cur_lens, kvH: int):
    """Per-slot append into the carried flat scale operands: writes each
    slot's new (kvH,) scale row at flat column ``cur_lens[b]*kvH`` — the
    (L, B, 1, S*kvH) counterpart of ``_upd_slot_all`` (one scatter, never
    the full (L, B, S, kvH) -> flat relayout)."""
    stacked = jnp.stack([n[:, 0] for n in new_per_layer])    # (L, B, kvH)
    L, B, _ = stacked.shape
    li = jnp.broadcast_to(jnp.arange(L)[:, None, None], (L, B, kvH))
    bi = jnp.broadcast_to(jnp.arange(B)[None, :, None], (L, B, kvH))
    ci = jnp.broadcast_to(
        cur_lens[None, :, None] * kvH + jnp.arange(kvH)[None, None, :],
        (L, B, kvH))
    return flat.at[li, bi, 0, ci].set(stacked)


# ── jitted core ─────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("cfg", "tcfg", "max_seq", "kv_quant",
                                   "with_image", "use_flash"))
def _prefill(params, cfg, tcfg: LlamaConfig, ids, mask, pixels, max_seq: int,
             kv_quant: bool, with_image: bool, use_flash: bool = False):
    """One program per length bucket: embed (+ vision splice) -> prefill ->
    argmax. Must be jitted — calling llama_prefill eagerly dispatches every
    op separately, which costs seconds per request through the relay."""
    if with_image:
        from attwarp_tpu.models.llava import embed_and_splice

        embeds = embed_and_splice(params, cfg, ids, pixels)
    else:
        embeds = params["llama"]["embed_tokens"][jnp.clip(ids, 0, None)]
    logits, block, _ = llama_prefill(
        params["llama"], tcfg, embeds, mask, max_seq=max_seq,
        kv_quant=kv_quant, use_flash=use_flash,
    )
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), block


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _insert_dense_group(cache: LlamaKVCache, block: LlamaKVCache, slots, cfg):
    """Write a BATCHED prefill block (L, n, Tb, H, D) into ``n`` slots in
    one dispatch (``slots``: (n,) traced slot indices; n is static via the
    block shape). One compilation per (bucket, group size)."""
    k, v = cache.k, cache.v
    for j in range(block.k.shape[1]):
        k = jax.lax.dynamic_update_slice(
            k, block.k[:, j:j + 1].astype(k.dtype), (0, slots[j], 0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            v, block.v[:, j:j + 1].astype(v.dtype), (0, slots[j], 0, 0, 0))
    return LlamaKVCache(k, v)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _insert_quant_group(cache: QuantKVCache, block: QuantKVCache, slots, cfg):
    def ins_all(big, small):
        zeros = (0,) * (big.ndim - 2)
        for j in range(small.shape[1]):
            big = jax.lax.dynamic_update_slice(
                big, small[:, j:j + 1], (0, slots[j], *zeros))
        return big

    return QuantKVCache(
        ins_all(cache.k_q, block.k_q), ins_all(cache.k_s, block.k_s),
        ins_all(cache.v_q, block.v_q), ins_all(cache.v_s, block.v_s),
    )


@partial(jax.jit, donate_argnums=(0,))
def _insert_tuple_group(cache, block, slots):
    """Dense tuple cache: write a BATCHED block (L, n, Tb, H, D) into ``n``
    slots in one dispatch (the Qwen2-VL counterpart of
    ``_insert_dense_group``)."""
    k, v = cache
    bk, bv = block
    for j in range(bk.shape[1]):
        k = jax.lax.dynamic_update_slice(
            k, bk[:, j:j + 1].astype(k.dtype), (0, slots[j], 0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            v, bv[:, j:j + 1].astype(v.dtype), (0, slots[j], 0, 0, 0))
    return (k, v)


def _sample_tokens(logits, keys, temps, top_k: int, any_sampling: bool = True):
    """Per-slot token choice: greedy where ``temps[b] == 0``, else
    temperature (optionally top-k-truncated) sampling with that slot's own
    PRNG key. Returns (tokens (B,), new keys (B, 2)).

    ``any_sampling`` is a STATIC flag the engine derives from the active
    slots' temperatures: when False the categorical branch is skipped
    entirely, saving a ``B × vocab`` gumbel draw per step (64 slots × 152k
    Qwen2 vocab = 9.7M threefry values) that the ``where`` would discard.
    Measured NEUTRAL on the Qwen2-VL-7B chunk at B=64 (44.9 ms/step either
    way — the draw hides behind the weight streaming), so this is program
    hygiene, not the chunk's bottleneck; kept because it is free and the
    saving is shape-dependent. Flipping the flag costs one extra chunk
    compile per direction."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if not any_sampling:
        return greedy, keys

    def one(logit, key, temp):
        key, sub = jax.random.split(key)
        scaled = logit / jnp.maximum(temp, 1e-6)
        if top_k > 0:
            kth = jax.lax.top_k(scaled, top_k)[0][-1]
            scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
        return jax.random.categorical(sub, scaled).astype(jnp.int32), key

    sampled, new_keys = jax.vmap(one)(logits, keys, temps)
    return jnp.where(temps > 0, sampled, greedy), new_keys


def _upd_slot(cache, new, layer, cur_lens):
    """Per-slot write into the FULL (L, B, S, ...) cache: one scatter of B
    rows at (layer, b, cur_lens[b]). Writes only the new slots — never a
    layer or cache copy (the vmapped-dynamic_update_slice/.at[i].set form
    rewrote the whole cache per layer per tick, the same pathology the
    decode step's jnp.stack rework removed)."""
    B = new.shape[0]
    return cache.at[layer, jnp.arange(B), cur_lens].set(new[:, 0])


def _upd_slot_all(cache, new_per_layer, cur_lens):
    """ALL layers' per-slot writes in one scatter: new_per_layer is a list
    of L (B, 1, ...) arrays; writes land at (l, b, cur_lens[b]). Used by
    the flash-decoding step, whose layers all read the step-entry cache
    and defer their appends to one batched update (see
    ops/pallas_decode_attn.py)."""
    stacked = jnp.stack([n[:, 0] for n in new_per_layer])    # (L, B, ...)
    L, B = stacked.shape[0], stacked.shape[1]
    li = jnp.broadcast_to(jnp.arange(L)[:, None], (L, B))
    bi = jnp.broadcast_to(jnp.arange(B)[None, :], (L, B))
    ci = jnp.broadcast_to(cur_lens[None, :], (L, B))
    return cache.at[li, bi, ci].set(stacked)


@partial(jax.jit,
         static_argnames=("cfg", "k_steps", "top_k", "unroll", "sampling"),
         donate_argnums=(3,))
def _step_chunk(params, cfg: LlamaConfig, tokens, kv, cur_lens, starts,
                keys, temps, k_steps: int, top_k: int = 0,
                unroll: bool = False, sampling: bool = True):
    """Advance every slot ``k_steps`` tokens in ONE dispatch.

    Dispatch latency dominates a per-token host loop (through the remote
    relay a single short program costs ~200 ms; even locally, jit dispatch
    per token is the classic serving overhead), so the engine decodes in
    chunks: finished slots keep generating discarded tokens for the rest of
    the chunk (≤ k_steps-1 wasted steps per request) and the host truncates
    at EOS/max_new. Token choice is per-slot greedy or temperature/top-k
    sampling (``_sample_tokens``).

    ``unroll`` picks the loop form (same math either way; token-parity
    tested for both): ``lax.scan`` carries the cache as loop state, and XLA
    double-buffers loop carries — TWO live copies of the donated cache,
    which is what OOM'd ≥24 slots at 7B (round-2 VERDICT). The Python-
    unrolled form chains the scatter writes through one buffer so big slot
    pools fit, at a measured ~5-10%% step-time cost at ≤16 slots (larger
    program schedules slightly worse). ``ServeEngine`` picks per pool size.
    Returns (chunk (k_steps, B), kv, cur_lens+k_steps, keys)."""
    if unroll:
        # pay the kernel's scale relayout ONCE per chunk, not per step
        # (llama.make_decode_prep; the steps append to it incrementally)
        prep = make_decode_prep(kv)
        chunk = []
        for _ in range(k_steps):
            logits, kv, prep = _step(
                params, cfg, tokens, kv, cur_lens, starts, prep)
            tokens, keys = _sample_tokens(logits, keys, temps, top_k, sampling)
            cur_lens = cur_lens + 1
            chunk.append(tokens)
        return jnp.stack(chunk), kv, cur_lens, keys

    def body(carry, _):
        tokens, kv, cur_lens, keys = carry
        logits, kv, _ = _step(params, cfg, tokens, kv, cur_lens, starts)
        nxt, keys = _sample_tokens(logits, keys, temps, top_k, sampling)
        return (nxt, kv, cur_lens + 1, keys), nxt

    (_, kv, cur_lens, keys), chunk = jax.lax.scan(
        body, (tokens, kv, cur_lens, keys), None, length=k_steps
    )
    return chunk, kv, cur_lens, keys


def _step(params, cfg: LlamaConfig, tokens, kv, cur_lens, starts, prep=None):
    """Advance every slot one token. Returns (logits, new_kv, prep) —
    ``prep`` is the carried flash-decoding scale operands (None outside a
    prep-threaded chunk; see ``make_decode_prep``).

    tokens (B,) int32; cur_lens (B,) = cache position the new token is
    written at; starts (B,) = where each slot's prompt begins (prompts are
    left-padded inside their length bucket, so the pad region [0, start) is
    permanently masked out). Rope positions are valid-token counts
    (cur_lens - starts), matching the prefill's cumsum convention. Mirrors
    ``llama_decode_step`` but with PER-SLOT positions — the
    continuous-batching requirement the shared-scalar step cannot express."""
    B = tokens.shape[0]
    S = (kv.k_q if isinstance(kv, QuantKVCache) else kv.k).shape[2]
    quant = isinstance(kv, QuantKVCache)
    emb = params["embed_tokens"][tokens][:, None, :]
    positions = cur_lens - starts
    cos, sin = rope_cos_sin(positions[:, None], cfg.head_dim, cfg.rope_theta)
    # each slot attends its own prefix INCLUDING the token written this step
    ar = jnp.arange(S)[None, :]
    kv_mask = (ar >= starts[:, None]) & (ar <= cur_lens[:, None])
    x = emb
    new = kv
    # same measured form ladder as llama_decode_step: Pallas flash-decoding
    # in its win region (stale step-entry reads + external current-token
    # merge + ONE batched per-slot append — see the kernel module's
    # docstring), scale-factored XLA at B>=16, fused dequant below.
    use_kernel = quant and decode_attn_supported(
        S, cfg.kv_heads, cfg.head_dim, B)
    if use_kernel:
        strict = (ar >= starts[:, None]) & (ar < cur_lens[:, None])
        if prep is not None:
            ksx, vsx = prep
            bias = decode_attn_bias(strict, cfg.kv_heads)
        else:
            ksx, vsx, bias = prepare_decode_attn_operands(
                kv.k_s, kv.v_s, strict)
        appends = []
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        q = apply_linear(h, lp["q_proj"]).reshape(B, 1, cfg.num_attention_heads, cfg.head_dim)
        k1 = apply_linear(h, lp["k_proj"]).reshape(B, 1, cfg.kv_heads, cfg.head_dim)
        v1 = apply_linear(h, lp["v_proj"]).reshape(B, 1, cfg.kv_heads, cfg.head_dim)
        q, k1 = apply_rope(q, k1, cos, sin)
        if quant:
            k1q, k1s = quantize_kv(k1)
            v1q, v1s = quantize_kv(v1)
            if use_kernel:
                appends.append((k1q, k1s, v1q, v1s))
                attn = decode_attn_quantcache(
                    q, kv.k_q, ksx, kv.v_q, vsx, bias,
                    k1q, k1s, v1q, v1s,
                    num_heads=cfg.num_attention_heads,
                    sm_scale=1.0 / float(np.sqrt(cfg.head_dim)), layer=i,
                )
            elif B >= 16:
                new = QuantKVCache(
                    _upd_slot(new.k_q, k1q, i, cur_lens),
                    _upd_slot(new.k_s, k1s, i, cur_lens),
                    _upd_slot(new.v_q, v1q, i, cur_lens),
                    _upd_slot(new.v_s, v1s, i, cur_lens),
                )
                attn, _ = _attn_quantcache(
                    q, new.k_q[i], new.k_s[i], new.v_q[i], new.v_s[i],
                    kv_mask[:, None, :], cfg, want_probs=False,
                )
            else:
                new = QuantKVCache(
                    _upd_slot(new.k_q, k1q, i, cur_lens),
                    _upd_slot(new.k_s, k1s, i, cur_lens),
                    _upd_slot(new.v_q, v1q, i, cur_lens),
                    _upd_slot(new.v_s, v1s, i, cur_lens),
                )
                k = dequantize_kv(new.k_q[i], new.k_s[i], q.dtype)
                v = dequantize_kv(new.v_q[i], new.v_s[i], q.dtype)
                attn, _ = _attn(q, k, v, kv_mask[:, None, :], cfg,
                                want_probs=False)
        else:
            new = LlamaKVCache(
                _upd_slot(new.k, k1.astype(new.k.dtype), i, cur_lens),
                _upd_slot(new.v, v1.astype(new.v.dtype), i, cur_lens),
            )
            attn, _ = _attn(q, new.k[i], new.v[i], kv_mask[:, None, :], cfg,
                            want_probs=False)
        x = x + apply_linear(attn, lp["o_proj"])
        h2 = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        mlp = apply_linear(
            jax.nn.silu(apply_linear(h2, lp["gate_proj"])) * apply_linear(h2, lp["up_proj"]),
            lp["down_proj"],
        )
        x = x + mlp
    if use_kernel:
        # ONE batched per-slot append of every layer's new K/V after the
        # last stale read — keeps the donated cache's update in place
        new = QuantKVCache(
            _upd_slot_all(kv.k_q, [a[0] for a in appends], cur_lens),
            _upd_slot_all(kv.k_s, [a[1] for a in appends], cur_lens),
            _upd_slot_all(kv.v_q, [a[2] for a in appends], cur_lens),
            _upd_slot_all(kv.v_s, [a[3] for a in appends], cur_lens),
        )
        if prep is not None:
            prep = (
                _upd_prep_slots(ksx, [a[1] for a in appends], cur_lens,
                                cfg.kv_heads),
                _upd_prep_slots(vsx, [a[3] for a in appends], cur_lens,
                                cfg.kv_heads),
            )
    elif prep is not None:
        prep = make_decode_prep(new)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = lm_logits(x[:, 0], params)
    return logits, new, prep


# ── Qwen2-VL family (M-RoPE; per-slot position deltas) ─────────────────


@partial(jax.jit, static_argnames=("cfg", "tcfg", "grid_thw", "max_seq",
                                   "kv_quant", "use_flash"))
def _qwen_prefill(params, cfg, tcfg, ids, mask, patches, positions,
                  grid_thw, max_seq: int, kv_quant: bool,
                  use_flash: bool = False):
    """Qwen2-VL admission prefill, batched like the LLaVA one: vision tower
    (vmapped over per-sample patches when given) + M-RoPE text prefill.
    ``ids``/``mask`` are (n, Tb), ``positions`` (3, n, Tb) come from the
    batched ``get_mrope_positions`` on the host, ``patches`` is
    (n, N, C·T·P·P) for one same-grid image per sample (grouping by pixel
    shape guarantees equal grids) or a dummy when ``grid_thw`` is None."""
    from attwarp_tpu.models.qwen2vl import (
        embed_and_splice as qwen_splice,
        mrope_cos_sin,
        qwen2vl_prefill,
        qwen2vl_vision_features,
    )

    if grid_thw is not None:
        feats = jax.vmap(
            lambda p: qwen2vl_vision_features(
                params["vision"], cfg.vision, p, (grid_thw[1], grid_thw[2])
            )
        )(patches)                                   # (n, N/merge², D)
        embeds = qwen_splice(params, cfg, ids, feats)
    else:
        embeds = params["text"]["embed_tokens"][jnp.clip(ids, 0, None)]
    cos, sin = mrope_cos_sin(positions, tcfg)
    logits, block, _ = qwen2vl_prefill(
        params["text"], tcfg, embeds, mask, cos, sin, max_seq=max_seq,
        kv_quant=kv_quant, use_flash=use_flash,
    )
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), block


@partial(jax.jit,
         static_argnames=("cfg", "k_steps", "top_k", "unroll", "sampling"),
         donate_argnums=(3,))
def _qwen_step_chunk(params, cfg, tokens, kv, cur_lens, starts, deltas,
                     keys, temps, k_steps: int, top_k: int = 0,
                     unroll: bool = False, sampling: bool = True):
    """Chunked Qwen decode: all three M-RoPE streams share the text position
    ``(cur_len - start) + delta`` per slot (HF get_rope_index semantics for
    tokens after the prompt)."""
    from attwarp_tpu.models.qwen2vl import _apply_rope, _attn as _qattn, _mlp, _qkv, mrope_cos_sin

    def one(tokens, kv, cur_lens, prep=None):
        B = tokens.shape[0]
        S = (kv.k_q if isinstance(kv, QuantKVCache) else kv[0]).shape[2]
        quant = isinstance(kv, QuantKVCache)
        x = params["text"]["embed_tokens"][tokens][:, None, :]
        p = (cur_lens - starts + deltas).astype(jnp.int32)       # (B,)
        pos3 = jnp.broadcast_to(p[None, :, None], (3, B, 1))
        cos, sin = mrope_cos_sin(pos3, cfg)
        ar = jnp.arange(S)[None, :]
        kv_mask = (ar >= starts[:, None]) & (ar <= cur_lens[:, None])
        new = kv
        use_kernel = quant and decode_attn_supported(
            S, cfg.kv_heads, cfg.head_dim, B)
        if use_kernel:
            strict = (ar >= starts[:, None]) & (ar < cur_lens[:, None])
            if prep is not None:
                ksx, vsx = prep
                bias = decode_attn_bias(strict, cfg.kv_heads)
            else:
                ksx, vsx, bias = prepare_decode_attn_operands(
                    kv.k_s, kv.v_s, strict)
            appends = []
        for i, lp in enumerate(params["text"]["layers"]):
            h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            q, k1, v1 = _qkv(lp, cfg, h)
            q, k1 = _apply_rope(q, k1, cos, sin)
            if quant:
                k1q, k1s = quantize_kv(k1)
                v1q, v1s = quantize_kv(v1)
                if use_kernel:
                    appends.append((k1q, k1s, v1q, v1s))
                    attn = decode_attn_quantcache(
                        q, kv.k_q, ksx, kv.v_q, vsx, bias,
                        k1q, k1s, v1q, v1s,
                        num_heads=cfg.num_attention_heads,
                        sm_scale=1.0 / float(np.sqrt(cfg.head_dim)),
                        layer=i,
                    )
                else:
                    new = QuantKVCache(
                        _upd_slot(new.k_q, k1q, i, cur_lens),
                        _upd_slot(new.k_s, k1s, i, cur_lens),
                        _upd_slot(new.v_q, v1q, i, cur_lens),
                        _upd_slot(new.v_s, v1s, i, cur_lens),
                    )
                    k = dequantize_kv(new.k_q[i], new.k_s[i], q.dtype)
                    v = dequantize_kv(new.v_q[i], new.v_s[i], q.dtype)
                    attn, _ = _qattn(q, k, v, kv_mask[:, None, :], cfg,
                                     want_probs=False)
            else:
                new = (
                    _upd_slot(new[0], k1.astype(new[0].dtype), i, cur_lens),
                    _upd_slot(new[1], v1.astype(new[1].dtype), i, cur_lens),
                )
                attn, _ = _qattn(q, new[0][i], new[1][i],
                                 kv_mask[:, None, :], cfg, want_probs=False)
            x = x + apply_linear(attn, lp["o_proj"])
            h2 = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            x = x + _mlp(lp, h2)
        if use_kernel:
            new = QuantKVCache(
                _upd_slot_all(kv.k_q, [a[0] for a in appends], cur_lens),
                _upd_slot_all(kv.k_s, [a[1] for a in appends], cur_lens),
                _upd_slot_all(kv.v_q, [a[2] for a in appends], cur_lens),
                _upd_slot_all(kv.v_s, [a[3] for a in appends], cur_lens),
            )
            if prep is not None:
                prep = (
                    _upd_prep_slots(ksx, [a[1] for a in appends], cur_lens,
                                    cfg.kv_heads),
                    _upd_prep_slots(vsx, [a[3] for a in appends], cur_lens,
                                    cfg.kv_heads),
                )
        elif prep is not None:
            prep = make_decode_prep(new)
        x = rms_norm(x, params["text"]["norm"], cfg.rms_norm_eps)
        logits = lm_logits(x[:, 0], params["text"])
        return logits, new, prep

    # same scan/unroll split as _step_chunk (scan double-buffers the
    # donated cache — the round-2 big-pool OOM; unroll trades a little
    # step time for fitting)
    if unroll:
        prep = make_decode_prep(kv)
        chunk = []
        for _ in range(k_steps):
            logits, kv, prep = one(tokens, kv, cur_lens, prep)
            tokens, keys = _sample_tokens(logits, keys, temps, top_k, sampling)
            cur_lens = cur_lens + 1
            chunk.append(tokens)
        return jnp.stack(chunk), kv, cur_lens, keys

    def body(carry, _):
        tokens, kv, cur_lens, keys = carry
        logits, kv, _ = one(tokens, kv, cur_lens)
        nxt, keys = _sample_tokens(logits, keys, temps, top_k, sampling)
        return (nxt, kv, cur_lens + 1, keys), nxt

    (_, kv, cur_lens, keys), chunk = jax.lax.scan(
        body, (tokens, kv, cur_lens, keys), None, length=k_steps
    )
    return chunk, kv, cur_lens, keys


# ── engine ──────────────────────────────────────────────────────────────


@dataclass
class Request:
    rid: int
    input_ids: np.ndarray            # (T,) expanded image tokens (LLaVA)
    pixel_values: Optional[np.ndarray] = None   # (S, S, 3) or None (text-only)
    max_new_tokens: int = 64
    temperature: float = 0.0         # 0 = greedy


@dataclass
class _Slot:
    rid: int = -1
    generated: List[int] = field(default_factory=list)
    remaining: int = 0
    active: bool = False
    pending: bool = False   # prefill dispatched, first token not yet fetched


class ServeEngine:
    """Continuous-batching greedy-decode engine over a ``LlavaModel``.

    >>> eng = ServeEngine(model, slots=8, max_seq=768)
    >>> eng.submit(ids, pixels, max_new_tokens=32)   # any number of times
    >>> results = eng.run()                          # {rid: [token, ...]}
    """

    def __init__(self, model, slots: int = 8, max_seq: int = 768,
                 bucket: int = 64, kv_quant: bool = False,
                 steps_per_tick: int = 8, top_k: int = 0, seed: int = 0,
                 use_flash: bool = False, chunk_impl: str = "auto",
                 admit_batch: int = 4, admit_batch_cold: int = 0):
        self.model = model
        self.cfg = model.cfg
        self.tcfg = model.cfg.text
        self.slots = slots
        if kv_quant:
            # round the slot cache to a multiple of 64 so the Pallas
            # flash-decoding kernel's seq-tile gate holds for the decode
            # read (ops/pallas_decode_attn.py; extra slots stay masked)
            max_seq = -(-max_seq // 64) * 64
        self.max_seq = max_seq
        self.bucket = bucket
        self.kv_quant = kv_quant
        # tokens decoded per dispatch: amortizes jit-dispatch/relay latency
        # at the cost of ≤ steps_per_tick-1 discarded steps per finished slot
        self.steps_per_tick = max(1, steps_per_tick)
        # max requests prefilled in ONE batched admission call. A single
        # 640-token prefill is already ~80% MXU-bound, so batching saves
        # dispatch/sync overhead, not much compute — while the returned KV
        # block costs (L, n, Tb, H, hd) HBM next to the resident cache
        # (n=8 dense at 7B = 2.7 GiB, which OOM'd beside a 16-slot dense
        # cache). 4 balances the two.
        self.admit_batch = max(1, admit_batch)
        # Startup admission ramp (VERDICT r4 item 6): while the pool is
        # IDLE there are no resident slots for a wide prefill to stall, and
        # the first wave's TTFT is just serialized admission groups (at 32
        # slots / admit 2 that measured 1217 ms first-wave p50) — so cold
        # admissions use a wider cap and steady-state keeps the small one
        # that bounds the KV-block transient beside a full cache. 0 = auto
        # (min(slots, 8), clamped to the HBM budget after the cache is
        # allocated below); pass 1 to disable the ramp.
        self.admit_batch_cold = max(
            self.admit_batch,
            min(slots, 8) if admit_batch_cold == 0 else admit_batch_cold)
        self._auto_cold = admit_batch_cold == 0
        # second family: Qwen2-VL (M-RoPE positions carry a per-request delta)
        self.family = ("qwen2vl" if hasattr(model.cfg, "vision_start_token_id")
                       else "llava")
        # Pallas flash prefill (both families; engages on long prompts)
        self.use_flash = use_flash
        if kv_quant:
            self.kv = init_quant_kv_cache(self.tcfg, slots, max_seq)
        elif self.family == "qwen2vl":
            t = self.tcfg
            shape = (t.num_hidden_layers, slots, max_seq, t.kv_heads, t.head_dim)
            self.kv = (jnp.zeros(shape, self._cache_dtype()),
                       jnp.zeros(shape, self._cache_dtype()))
        else:
            self.kv = init_kv_cache(self.tcfg, slots, max_seq,
                                    dtype=self._cache_dtype())
        if self._auto_cold:
            self.admit_batch_cold = self._fit_cold_cap(self.admit_batch_cold)

        # chunk loop form: lax.scan is ~5-10% faster per step but XLA
        # double-buffers the carry, keeping TWO live copies of the cache —
        # "auto" switches to the unrolled form when a second copy (plus the
        # weights) would no longer fit comfortably in one v5e's 16 GiB HBM
        if chunk_impl not in ("auto", "scan", "unroll"):
            raise ValueError(f"unknown chunk_impl {chunk_impl!r}")
        if chunk_impl == "auto":
            nbytes = sum(
                x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves((self.kv, model.params))
            ) + sum(x.size * x.dtype.itemsize
                    for x in jax.tree_util.tree_leaves(self.kv))
            # kv_quant also prefers the unrolled chunk: the flash-decoding
            # kernel's custom-call reads defeat XLA's in-place carry
            # aliasing at the scan boundary (4 full-cache copies per
            # crossing; see ops/pallas_decode_attn.py), so the scan form
            # pays them every step while the unrolled form pays none
            self.chunk_unroll = kv_quant or nbytes > 14 * 2**30
        else:
            self.chunk_unroll = chunk_impl == "unroll"
        self._slots = [_Slot() for _ in range(slots)]
        self.tokens = np.zeros((slots,), np.int32)
        self.cur_lens = np.zeros((slots,), np.int32)
        self.starts = np.zeros((slots,), np.int32)
        self.deltas = np.zeros((slots,), np.int32)   # qwen M-RoPE deltas
        # per-slot sampling state: 0 temperature = greedy; each request gets
        # a reproducible key (fold_in(seed, rid))
        self.top_k = top_k
        self._base_key = jax.random.PRNGKey(seed)
        self.temps = np.zeros((slots,), np.float32)
        self.keys = np.zeros((slots, 2), np.uint32)
        self.queue: deque = deque()
        self._pending: List = []   # (slot, Request, unfetched first-token)
        self.results: Dict[int, List[int]] = {}
        # per-request latency accounting: rid -> {submit, first_token, done}
        # (host wall-clock; first_token lands right after the prefill)
        self.request_stats: Dict[int, Dict[str, float]] = {}
        # cadence accounting (tools/bench_chunked_cadence.py): one entry per
        # tick — (tick-end wall-clock, {rid: tokens consumed this tick}) —
        # and one per admission wave — (start, end, n admitted). Both are
        # cheap host appends; resident-slot inter-token gaps across an
        # admission are derived from these.
        self.tick_log: List[Tuple[float, Dict[int, int]]] = []
        self.admit_log: List[Tuple[float, float, int]] = []
        self._next_rid = 0

    def _cache_dtype(self):
        lm = self.model.params.get("llama") or self.model.params["text"]
        emb = lm["embed_tokens"]
        return emb.dtype if hasattr(emb, "dtype") else jnp.float32

    def _fit_cold_cap(self, want: int) -> int:
        """Clamp the auto startup-ramp cap to what HBM actually holds.

        The cold admission's transient footprint scales with the group
        width n twice over: the returned KV block (one max_seq-bucket row
        per request) AND the prefill program's live activations — the
        full-sequence f32 logits (Tb·vocab per row: argmax-of-prefill
        picks the first token) plus the attention/MLP transients XLA
        keeps live (~64 hidden-size bf16 rows worth, empirically). Four
        measured feasibility points on one v5e at 7B int8+kv8+flash
        (6.53 GiB weights; 784-token cache rows of 203 MiB): 32 slots
        (6.32 GiB cache) fits admit-2, RESOURCE_EXHAUSTs at 4 and 8; 16
        slots (3.16 GiB cache) fits admit-4, exhausts at 8. The model —
        weights + cache + n·(block row + Tb·(4·vocab + 128·D)) + 0.5 GiB
        ≤ 0.92·HBM, halving until it holds — reproduces all four: ~0.7
        GiB/request at LLaVA geometry → cap 2 at 32 slots, cap 4 at 16.
        CPU (tests) is treated as unlimited, keeping min(slots, 8).
        (eval/harness.py::_fit_slots prices the same transient with a
        simpler runbook-calibrated term when choosing the SLOT count;
        deliberately not unified — see the note there.)"""
        leaf_bytes = (lambda tree: sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(tree)))
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm = stats.get("bytes_limit", 0)
        except Exception:
            hbm = 0
        if not hbm:
            # the axon relay's memory_stats() returns {} — v5e default
            hbm = (1 << 62) if jax.default_backend() == "cpu" else 16 * 2**30
        t = self.tcfg
        per_tok = 2 * t.num_hidden_layers * t.kv_heads * t.head_dim
        row = per_tok * self.max_seq * (
            (1 + 4 / t.head_dim) if self.kv_quant else 2)
        # per-request prefill activations: full-seq f32 logits + ~64
        # hidden-size bf16 transients (see docstring; calibrated)
        row += self.max_seq * (4 * t.vocab_size + 128 * t.hidden_size)
        budget = (int(hbm * 0.92) - leaf_bytes(self.model.params)
                  - leaf_bytes(self.kv) - (1 << 29))
        cap = want
        while cap > self.admit_batch and cap * row > budget:
            cap //= 2
        cap = max(self.admit_batch, cap)
        if cap < want:
            print(f"ServeEngine: startup-ramp cold cap {want} -> {cap} "
                  f"(admission-block row {row / 2**20:.0f} MiB at "
                  f"max_seq={self.max_seq}, block budget "
                  f"{max(budget, 0) / 2**30:.2f} GiB)")
        return cap

    # ── public API ─────────────────────────────────────────────────────
    def submit(self, input_ids, pixel_values=None, max_new_tokens: int = 64,
               temperature: float = 0.0) -> int:
        ids = np.asarray(input_ids).reshape(-1)
        Tb = -(-len(ids) // self.bucket) * self.bucket
        need = Tb + max_new_tokens + self.steps_per_tick
        if need > self.max_seq:
            raise ValueError(
                f"prompt bucket {Tb} + max_new {max_new_tokens} (+chunk "
                f"slack {self.steps_per_tick}) exceeds max_seq {self.max_seq}"
            )
        import time as _time

        rid = self._next_rid
        self._next_rid += 1
        self.request_stats[rid] = {"submit": _time.perf_counter()}
        self.queue.append(Request(rid, ids,
                                  None if pixel_values is None
                                  else np.asarray(pixel_values),
                                  max_new_tokens, float(temperature)))
        return rid

    def run(self) -> Dict[int, List[int]]:
        """Drive until queue and slots drain; returns {rid: generated ids}."""
        while self.queue or any(s.active or s.pending for s in self._slots):
            self._admit()
            if any(s.active for s in self._slots):
                self._tick()
            elif self._pending:
                # nothing decoding: sync the pending admissions directly
                self._activate_pending(jax.device_get(
                    [f for _, _, f in self._pending]
                ))
        return self.results

    # ── internals ──────────────────────────────────────────────────────
    def _admit(self):
        """NON-BLOCKING BATCHED admission: queued requests for every free
        slot are grouped by (length bucket, has-image) and prefilled in ONE
        jitted call per group chunk (a wave of 16 single prefills cost
        ~16×65 ms serialized; batched it's one ~B-efficient prefill — the
        measured serving bottleneck after the decode rework). First-token
        arrays stay unfetched and are synced TOGETHER with the next tick's
        chunk, so a mid-run admission never stalls the other slots'
        decoding. A pending slot is skipped by the harvest until activation
        (its chunk columns are garbage the masks make unreachable). Group
        chunks use power-of-two sizes capped at ``admit_batch`` so the
        prefill compiles once per (bucket, size), not per arrival count.

        Both families batch: Qwen2-VL groups additionally key on pixel
        shape (⇒ equal vision grid), and M-RoPE deltas stay per-request."""
        free = [b for b, s in enumerate(self._slots)
                if not (s.active or s.pending)]
        n = min(len(free), len(self.queue))
        if n == 0:
            return
        import time as _time

        _t_admit0 = _time.perf_counter()
        pairs = []
        for b in free[:n]:
            req = self.queue.popleft()
            self._slots[b].pending = True
            self._slots[b].rid = req.rid
            pairs.append((b, req))
        # On any prefill failure, un-admitted slots are restored and their
        # requests pushed back (in order) before the error propagates, so a
        # crashed admission can't wedge the engine with orphaned pending
        # slots (run() would otherwise spin on them forever).
        admitted = set()
        # startup ramp: no resident decodes to stall while the pool is
        # idle -> admit in the widest groups (pending slots don't count:
        # they activate only at the next tick's harvest)
        cap = (self.admit_batch
               if any(s.active for s in self._slots)
               else self.admit_batch_cold)
        try:
            # Group by (length bucket, pixel shape): mixed image shapes in
            # one bucket must not share an np.stack / jitted program. For
            # Qwen2-VL equal pixel shape also means equal vision grid, so
            # the M-RoPE structure is shared and admission batches exactly
            # like LLaVA's (deltas stay per-request, computed host-side).
            groups: Dict[Tuple[int, Optional[Tuple[int, ...]]], List] = {}
            for b, req in pairs:
                T = len(req.input_ids)
                assert T <= self.max_seq - 1, (T, self.max_seq)
                Tb = min(-(-T // self.bucket) * self.bucket, self.max_seq)
                pix = (None if req.pixel_values is None
                       else tuple(np.shape(req.pixel_values)))
                groups.setdefault((Tb, pix), []).append((b, req))
            prefill = (self._prefill_qwen_group if self.family == "qwen2vl"
                       else self._prefill_group)
            for (Tb, pix), members in groups.items():
                i = 0
                while i < len(members):
                    size = 1 << ((len(members) - i).bit_length() - 1)
                    size = min(size, cap)
                    chunk = members[i:i + size]
                    prefill(Tb, pix is not None, chunk)
                    admitted.update(b for b, _ in chunk)
                    i += size
        except Exception:
            rollback = [(b, req) for b, req in pairs if b not in admitted]
            for b, req in reversed(rollback):
                self._slots[b].pending = False
                self._slots[b].rid = -1
                self.queue.appendleft(req)
            raise
        if admitted:
            self.admit_log.append(
                (_t_admit0, _time.perf_counter(), len(admitted)))

    def _run_prefill(self, ids, mask, pixels, Tb: int, with_image: bool):
        """Admission-prefill hook: runs the batched LLaVA prefill on this
        engine's own devices. ``serving/disagg.py`` overrides it to run on
        a separate prefill device group and ship the KV block across."""
        return _prefill(
            self.model.params, self.cfg, self.tcfg, ids, mask, pixels, Tb,
            self.kv_quant, with_image, self.use_flash,
        )

    def _run_qwen_prefill(self, ids, mask, patches, pos, grid, Tb: int):
        """Per-request Qwen2-VL admission-prefill hook (see _run_prefill)."""
        return _qwen_prefill(
            self.model.params, self.cfg, self.tcfg, ids, mask, patches,
            pos, grid, Tb, self.kv_quant, self.use_flash,
        )

    def _prefill_group(self, Tb: int, with_image: bool, chunk) -> None:
        """One batched prefill + one grouped insert for ``chunk`` =
        [(slot, request), ...] sharing a length bucket."""
        n = len(chunk)
        ids = np.zeros((n, Tb), np.int64)
        mask = np.zeros((n, Tb), bool)
        for j, (b, req) in enumerate(chunk):
            pad = Tb - len(req.input_ids)
            ids[j, pad:] = req.input_ids
            mask[j, pad:] = True
            self.cur_lens[b] = Tb
            self.starts[b] = pad
        pixels = (
            jnp.asarray(np.stack([r.pixel_values for _, r in chunk]),
                        jnp.float32)
            if with_image else jnp.zeros((n, 1, 1, 3), jnp.float32)
        )
        firsts, block = self._run_prefill(
            jnp.asarray(ids), jnp.asarray(mask), pixels, Tb, with_image)
        slots_idx = jnp.asarray([b for b, _ in chunk], jnp.int32)
        if self.kv_quant:
            self.kv = _insert_quant_group(self.kv, block, slots_idx, self.tcfg)
        else:
            self.kv = _insert_dense_group(self.kv, block, slots_idx, self.tcfg)
        for j, (b, req) in enumerate(chunk):
            self._pending.append((b, req, firsts[j:j + 1]))

    def _activate_pending(self, firsts):
        import time as _time

        now = _time.perf_counter()
        for (b, req, _), first in zip(self._pending, firsts):
            slot = self._slots[b]
            tok = int(np.asarray(first)[0])
            self.tokens[b] = tok
            self.request_stats[req.rid]["first_token"] = now
            self.temps[b] = req.temperature
            self.keys[b] = np.asarray(
                jax.random.fold_in(self._base_key, req.rid), np.uint32
            )
            slot.generated = [tok]
            slot.remaining = req.max_new_tokens - 1
            slot.pending = False
            slot.active = True
            if tok == self.cfg.eos_token_id or slot.remaining <= 0:
                self._retire(b)
        self._pending.clear()

    def _prefill_qwen_group(self, Tb: int, with_image: bool, chunk) -> None:
        """Batched Qwen2-VL admission for ``chunk`` = [(slot, request), ...]
        sharing a (length bucket, pixel shape): one vmapped-vision M-RoPE
        prefill + one grouped insert. Equal pixel shape ⇒ equal vision grid
        (patchify is shape-deterministic), so a single static ``grid_thw``
        serves the whole group; rope deltas are per-request and re-based
        from the padded to the valid length, exactly as the per-request
        path did."""
        assert self.family == "qwen2vl", self.family
        from attwarp_tpu.models.qwen2vl import (
            get_mrope_positions,
            patchify_image,
        )

        n = len(chunk)
        ids = np.zeros((n, Tb), np.int64)
        mask = np.zeros((n, Tb), bool)
        for j, (b, req) in enumerate(chunk):
            pad = Tb - len(req.input_ids)
            ids[j, pad:] = req.input_ids
            mask[j, pad:] = True
            self.cur_lens[b] = Tb   # next write position (after the bucket)
            self.starts[b] = pad    # pad region permanently masked
        if with_image:
            pats, grids = zip(*(patchify_image(req.pixel_values,
                                               self.cfg.vision)
                                for _, req in chunk))
            grid = grids[0]
            assert all(g == grid for g in grids), grids
            patches = jnp.asarray(np.stack(pats))    # (n, N, C·T·P·P)
        else:
            patches, grid = jnp.zeros((n, 4, 8), jnp.float32), None
        pos, deltas = get_mrope_positions(
            ids, mask.astype(np.int64), grid or (1, 2, 2),
            self.cfg.image_token_id, self.cfg.vision.spatial_merge_size,
        )
        firsts, block = self._run_qwen_prefill(
            jnp.asarray(ids), jnp.asarray(mask), patches, jnp.asarray(pos),
            grid, Tb)
        # decode positions are (valid_len + generated) + delta_eng with
        # delta_eng re-based to VALID length (get_mrope_positions returns
        # it relative to the padded length Tb)
        for j, (b, req) in enumerate(chunk):
            self.deltas[b] = int(deltas[j]) + (Tb - len(req.input_ids))
        slots_idx = jnp.asarray([b for b, _ in chunk], jnp.int32)
        if self.kv_quant:
            self.kv = _insert_quant_group(self.kv, block, slots_idx,
                                          self.tcfg)
        else:
            self.kv = _insert_tuple_group(self.kv, block, slots_idx)
        for j, (b, req) in enumerate(chunk):
            # UNSYNCED (1,) jax slices — _admit fetches the wave at once
            self._pending.append((b, req, firsts[j:j + 1]))

    def _tick(self):
        K = self.steps_per_tick
        # STATIC sampling gate: an all-greedy pool (temps reset to 0 on
        # retire, set before activation) skips the per-step B×vocab gumbel
        # draw entirely — _sample_tokens documents the magnitude. Flipping
        # the flag costs one extra chunk compile per direction.
        sampling = bool((self.temps > 0).any())
        if self.family == "qwen2vl":
            chunk, self.kv, _, keys = _qwen_step_chunk(
                self.model.params, self.tcfg,
                jnp.asarray(self.tokens), self.kv, jnp.asarray(self.cur_lens),
                jnp.asarray(self.starts), jnp.asarray(self.deltas),
                jnp.asarray(self.keys), jnp.asarray(self.temps), K,
                self.top_k, self.chunk_unroll, sampling,
            )
            self.keys = np.array(keys)  # writable host copy
        else:
            chunk, self.kv, _, keys = _step_chunk(
                self.model.params["llama"], self.tcfg,
                jnp.asarray(self.tokens), self.kv, jnp.asarray(self.cur_lens),
                jnp.asarray(self.starts), jnp.asarray(self.keys),
                jnp.asarray(self.temps), K, self.top_k, self.chunk_unroll,
                sampling,
            )
            self.keys = np.array(keys)  # writable host copy
        # ONE host round-trip fetches the chunk AND any pending admissions'
        # first tokens; pending slots activate after this harvest and join
        # the next tick (their columns this tick are unreachable garbage)
        fetched = jax.device_get((chunk, [f for _, _, f in self._pending]))
        chunk, pending_firsts = np.asarray(fetched[0]), fetched[1]
        took: Dict[int, int] = {}
        for b, slot in enumerate(self._slots):
            if not slot.active:
                continue
            finished = False
            consumed = 0
            for j in range(K):
                tok = int(chunk[j, b])
                slot.generated.append(tok)
                slot.remaining -= 1
                consumed = j + 1
                if tok == self.cfg.eos_token_id or slot.remaining <= 0:
                    finished = True   # incl. EOS on the chunk's LAST step
                    break
            took[slot.rid] = consumed
            # device-side cur_lens advanced by K for everyone; the host copy
            # is authoritative and only counts consumed tokens (retired
            # slots' extra writes are dead — the next insert masks them out)
            self.cur_lens[b] += K
            self.tokens[b] = int(chunk[K - 1, b])
            if finished or self.cur_lens[b] + K >= self.max_seq:
                self._retire(b)
        import time as _time

        self.tick_log.append((_time.perf_counter(), took))
        if self._pending:
            self._activate_pending(pending_firsts)

    def _retire(self, b: int):
        import time as _time

        slot = self._slots[b]
        self.results[slot.rid] = slot.generated
        self.request_stats[slot.rid]["done"] = _time.perf_counter()
        slot.active = False
        slot.rid = -1
        self.cur_lens[b] = 0
        self.starts[b] = 0
        self.deltas[b] = 0
        self.temps[b] = 0.0
        self.tokens[b] = 0

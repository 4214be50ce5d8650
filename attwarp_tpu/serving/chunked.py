"""Chunked-prefill co-scheduling: prefill rides the decode weight stream.

WHY. The measured single-chip serving optimum is ADMISSION-bound
(ARCHITECTURE.md: 32 slots at 684.3 tok/s ≈ 99% of the *serialized*
decode+prefill ideal — roughly half the wall clock is 640-token admission
prefills that stall the slot pool). But 7B decode is HBM-bandwidth-bound
(the step streams ~13 GB of weights+cache and leaves the MXU ~90% idle)
while prefill is MXU-bound (~80% of bf16 peak) — the two phases starve
DIFFERENT units, so serializing them wastes each one's idle resource.

HOW (the Sarathi/vLLM chunked-prefill idea, built TPU-native). Each decode
step carries a P-token slice of one admitting prompt THROUGH THE SAME
MATMULS as the decode rows: hidden states are concatenated to (B+P, D)
for every projection/MLP, so the weights stream from HBM once per step
and the prefill tokens ride for (almost) free — the marginal cost is MXU
time the decode step wasn't using anyway. A 640-token prompt admits in
ceil(640/P) steps with zero dedicated prefill dispatches.

Numerics are IDENTICAL to the monolithic admission path:

- chunk self-attention reads a bf16 **staging buffer** holding the
  prompt's exact K/V so far (never the quantized cache) — the softmax row
  for prompt position g sees exactly the keys [0, g], same operands as
  the one-shot prefill;
- each chunk's K/V is **written through** to the slot cache (quantized per
  (token, head) when ``kv_quant`` — the same scales the monolithic prefill
  would produce, since scales never cross tokens), in ONE batched
  all-layers write AFTER the layer loop's last kernel read (a per-layer
  write interleaved with the kernel's custom-call reads defeats the
  cache's in-place update chain — measured ~4× step cost; the deferral is
  invisible because a mid-admission slot's decode rows never read its own
  fresh chunk rows), so when the last chunk lands the slot cache holds
  bit-identical contents and decode proceeds as if `_prefill` + insert
  had run;
- the first generated token is the argmax over the prompt's last valid
  row, like `_prefill`.

Static-shape tricks (everything is one compiled tick program):

- **sink slot**: the pool allocates ``slots + 1`` cache rows; the extra
  row is a write sink for inactive chunk descriptors, so no `lax.cond`
  ever wraps a cache write (a conditional around the donated cache risks
  the same copy pathologies as the scan carry — see
  ops/pallas_decode_attn.py).
- **OOB write-drop**: slots that are free or mid-admission keep
  ``cur_lens = max_seq``; their decode-row scatter writes fall out of
  bounds and XLA DROPS them (scatter semantics), so garbage decode rows
  never corrupt a freshly written prompt. (`dynamic_update_slice` CLAMPS
  instead — cache writes on this path must stay scatter-based.)
- **scratch region**: the staging buffer is ``stage_cap + P`` long; an
  inactive chunk writes at ``dst = stage_cap``.

Scheduling (host side, `run`): admissions are FIFO; one chunk per decode
step; an admission's chunks are contiguous (never interleaved with another
prompt's), which keeps the single staging buffer correct — a new prompt
only reuses staging after its predecessor's write-through completed.

MEASURED VERDICT (round 4, one v5e, 32 slots int8+kv8 96×128 — the A/B
table in ARCHITECTURE.md): on a SINGLE chip this loses to batched
admission on both aggregate (458.6 vs 691.8 tok/s) and first-wave TTFT
(p50 3650 vs 1217 ms) — a monolithic flash prefill retires the prompt in
~90 ms of dedicated compute while four P=160 chunks wait behind four
ticks of 32 co-tenants' decode. Use `ServeEngine` with batched admission
on one chip; this engine is scoped to multi-chip groups where admission
batches can't form and a dedicated prefill would idle the decode
collective.

Reference: the reference has no serving at all (SURVEY §2); this is the
TPU-native production path beyond `ServeEngine`'s serialized admission.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

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
    rms_norm,
    rope_cos_sin,
)
from attwarp_tpu.numerics.quant import apply_linear, dequantize_kv, lm_logits, quantize_kv
from attwarp_tpu.ops.pallas_decode_attn import (
    decode_attn_quantcache,
    decode_attn_supported,
    prepare_decode_attn_operands,
)
from attwarp_tpu.serving.engine import (
    Request,
    ServeEngine,
    _sample_tokens,
    _upd_slot,
    _upd_slot_all,
)


# ── jitted programs ──────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("cfg", "with_image", "stage_cap"))
def _embed_prompt(params, cfg, ids, pixels, with_image: bool, stage_cap: int):
    """Prompt embeddings (vision tower + splice for image requests), padded
    to the staging capacity: (stage_cap, D). One compile per (bucket,
    pixel-shape). This is the only per-admission program — the layers all
    run inside the shared tick."""
    if with_image:
        from attwarp_tpu.models.llava import embed_and_splice

        embeds = embed_and_splice(params, cfg, ids, pixels)
    else:
        embeds = params["llama"]["embed_tokens"][jnp.clip(ids, 0, None)]
    e = embeds[0]
    return jnp.pad(e, ((0, stage_cap - e.shape[0]), (0, 0)))


@partial(jax.jit, donate_argnums=(0,))
def _embq_insert(embq, e, row):
    return jax.lax.dynamic_update_slice(embq, e[None], (row, 0, 0))


@partial(jax.jit, static_argnames=("cfg", "tcfg", "grid", "stage_cap"))
def _embed_prompt_qwen(params, cfg, tcfg, ids, patches, pos, grid,
                       stage_cap: int):
    """Qwen2-VL admission embeddings + the prompt's M-RoPE cos/sin tables,
    all padded to staging capacity: (stage_cap, D), (stage_cap, hd) × 2.
    Computing the FULL prompt's rope tables once here lets the fused tick
    slice (P, hd) per chunk instead of re-deriving 3-stream positions
    in-program. Per-request admission needs no pixel-shape grouping — every
    prompt gets its own grid (one compile per (bucket, grid))."""
    from attwarp_tpu.models.qwen2vl import (
        embed_and_splice as qwen_splice,
        mrope_cos_sin,
        qwen2vl_vision_features,
    )

    if grid is not None:
        feats = qwen2vl_vision_features(
            params["vision"], cfg.vision, patches[0], (grid[1], grid[2])
        )[None]
        embeds = qwen_splice(params, cfg, ids, feats)
    else:
        embeds = params["text"]["embed_tokens"][jnp.clip(ids, 0, None)]
    cos, sin = mrope_cos_sin(pos, tcfg)            # (1, Tb, hd)
    pad = ((0, stage_cap - embeds.shape[1]), (0, 0))
    return (jnp.pad(embeds[0], pad), jnp.pad(cos[0], pad),
            jnp.pad(sin[0], pad))


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _embq_insert_qwen(embq, cosq, sinq, e, c, s, row):
    return (jax.lax.dynamic_update_slice(embq, e[None], (row, 0, 0)),
            jax.lax.dynamic_update_slice(cosq, c[None], (row, 0, 0)),
            jax.lax.dynamic_update_slice(sinq, s[None], (row, 0, 0)))


def _chunk_mask(SK: int, P: int, dst, cpad):
    """(1, P, SK+P) mask for the [staging history | fresh chunk] attention:
    history keys are the prompt's rows [cpad, dst) already staged by earlier
    chunks; self keys are causal within the chunk, excluding left-pad rows
    (global key index dst+j' must be >= cpad). Together these cover exactly
    the monolithic prefill's row [cpad, g] for query g = dst + j."""
    mk = jnp.arange(SK)[None, None, :]
    hist = jnp.broadcast_to((mk >= cpad) & (mk < dst), (1, P, SK))
    jj = jnp.arange(P)
    self_m = (jj[None, :, None] >= jj[None, None, :]) & \
        ((dst + jj)[None, None, :] >= cpad)
    return jnp.concatenate([hist, jnp.broadcast_to(self_m, (1, P, P))], 2)


def _stage_write(stage_k, stage_v, sappend, dst):
    """All L layers' fresh chunk K/V land in the staging buffer in ONE
    batched write after the layer loop (same rationale as
    `_chunk_write_quant` — staging is ~0.5 GiB at 7B and a per-layer DUS
    interleaved with the kernel's custom calls copies it every layer)."""
    sk = jnp.concatenate([a[0] for a in sappend])
    sv = jnp.concatenate([a[1] for a in sappend])
    return (jax.lax.dynamic_update_slice(
                stage_k, sk.astype(stage_k.dtype), (0, dst, 0, 0)),
            jax.lax.dynamic_update_slice(
                stage_v, sv.astype(stage_v.dtype), (0, dst, 0, 0)))


def _chunk_write_quant(new: QuantKVCache, cappend, cslot, dst):
    """All L layers' chunk K/V land in the slot cache in ONE batched
    dynamic_update_slice chain AFTER the loop's last kernel read of the
    step-entry cache. A per-layer write interleaved with the kernel's
    custom-call reads defeats the cache's in-place update chain
    (ops/pallas_decode_attn.py design rule 2) — measured ~4× step cost."""
    ck = jnp.concatenate([a[0] for a in cappend])[:, None]
    cks = jnp.concatenate([a[1] for a in cappend])[:, None]
    cv = jnp.concatenate([a[2] for a in cappend])[:, None]
    cvs = jnp.concatenate([a[3] for a in cappend])[:, None]
    return QuantKVCache(
        jax.lax.dynamic_update_slice(new.k_q, ck, (0, cslot, dst, 0, 0)),
        jax.lax.dynamic_update_slice(new.k_s, cks, (0, cslot, dst, 0)),
        jax.lax.dynamic_update_slice(new.v_q, cv, (0, cslot, dst, 0, 0)),
        jax.lax.dynamic_update_slice(new.v_s, cvs, (0, cslot, dst, 0)),
    )


def _chunk_write_dense(k, v, cappend, cslot, dst):
    """Dense-cache counterpart of `_chunk_write_quant` (returns the two
    updated arrays; callers rewrap in their family's container)."""
    ck = jnp.concatenate([a[0] for a in cappend]).astype(k.dtype)[:, None]
    cv = jnp.concatenate([a[1] for a in cappend]).astype(v.dtype)[:, None]
    return (jax.lax.dynamic_update_slice(k, ck, (0, cslot, dst, 0, 0)),
            jax.lax.dynamic_update_slice(v, cv, (0, cslot, dst, 0, 0)))


def _fused_step(params, cfg: LlamaConfig, tokens, kv, stage, x_chk,
                cur_lens, starts, dst, cslot, cpad, lastrow):
    """ONE decode step for every slot + ONE P-token prefill chunk, sharing
    the weight stream. Returns (decode logits (B', vocab), first-token
    logits row (vocab,), kv, stage, final chunk hidden (P, D)).

    Mirrors ``engine._step``'s measured decode-form ladder exactly (Pallas
    flash-decoding kernel in its gate, scale-factored XLA at B>=16, fused
    dequant below); the chunk rows add, per layer: one staging append +
    one dense (P, SK) attention + one per-chunk cache write-through.
    """
    B = tokens.shape[0]
    P = x_chk.shape[0]
    quant = isinstance(kv, QuantKVCache)
    S = (kv.k_q if quant else kv.k).shape[2]
    stage_k, stage_v = stage
    SK = stage_k.shape[1]
    H, kvH, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    emb = params["embed_tokens"][tokens][:, None, :]
    positions = cur_lens - starts
    cos, sin = rope_cos_sin(positions[:, None], hd, cfg.rope_theta)
    # chunk rope positions: global g = dst + j, left-pad convention
    g = dst + jnp.arange(P)
    cpos = jnp.clip(g - cpad, 0)
    ccos, csin = rope_cos_sin(cpos[None, :], hd, cfg.rope_theta)
    ar = jnp.arange(S)[None, :]
    kv_mask = (ar >= starts[:, None]) & (ar <= cur_lens[:, None])
    cmask = _chunk_mask(SK, P, dst, cpad)

    x = emb
    new = kv
    cappend = []
    sappend = []
    use_kernel = quant and decode_attn_supported(S, kvH, hd, B)
    if use_kernel:
        strict = (ar >= starts[:, None]) & (ar < cur_lens[:, None])
        ksx, vsx, bias = prepare_decode_attn_operands(kv.k_s, kv.v_s, strict)
        appends = []
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        hc = rms_norm(x_chk, lp["input_layernorm"], cfg.rms_norm_eps)
        hcat = jnp.concatenate([h[:, 0], hc], axis=0)      # (B+P, D)
        qa = apply_linear(hcat, lp["q_proj"])
        ka = apply_linear(hcat, lp["k_proj"])
        va = apply_linear(hcat, lp["v_proj"])
        q = qa[:B].reshape(B, 1, H, hd)
        k1 = ka[:B].reshape(B, 1, kvH, hd)
        v1 = va[:B].reshape(B, 1, kvH, hd)
        qc = qa[B:].reshape(1, P, H, hd)
        kc = ka[B:].reshape(1, P, kvH, hd)
        vc = va[B:].reshape(1, P, kvH, hd)
        q, k1 = apply_rope(q, k1, cos, sin)
        qc, kc = apply_rope(qc, kc, ccos, csin)
        # chunk attention = [staging history | fresh chunk], one exact
        # softmax over the concatenated keys. The fresh K/V NEVER touch
        # staging inside the loop — all writes (staging AND slot cache)
        # defer to one batched post-loop append, because a per-layer DUS
        # on a big donated buffer interleaved with the kernel's custom
        # calls defeats in-place updates (measured: the cache version cost
        # 4×/step; the staging version ~45 ms/step = 2×32×503 MB copies)
        k_all = jnp.concatenate([stage_k[i][None].astype(kc.dtype), kc], 1)
        v_all = jnp.concatenate([stage_v[i][None].astype(vc.dtype), vc], 1)
        cattn, _ = _attn(qc, k_all, v_all, cmask, cfg, want_probs=False)
        sappend.append((kc, vc))
        if quant:
            cappend.append((*quantize_kv(kc), *quantize_kv(vc)))
        else:
            cappend.append((kc, vc))
        # decode rows: the measured form ladder from engine._step
        if quant:
            k1q, k1s = quantize_kv(k1)
            v1q, v1s = quantize_kv(v1)
            if use_kernel:
                appends.append((k1q, k1s, v1q, v1s))
                attn = decode_attn_quantcache(
                    q, kv.k_q, ksx, kv.v_q, vsx, bias,
                    k1q, k1s, v1q, v1s,
                    num_heads=H,
                    sm_scale=1.0 / float(np.sqrt(hd)), layer=i,
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
        # merged residual + MLP: one weight stream for decode + chunk rows
        acat = jnp.concatenate([attn[:, 0], cattn[0]], axis=0)
        xcat = jnp.concatenate([x[:, 0], x_chk], axis=0)
        xcat = xcat + apply_linear(acat, lp["o_proj"])
        h2 = rms_norm(xcat, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        mlp = apply_linear(
            jax.nn.silu(apply_linear(h2, lp["gate_proj"]))
            * apply_linear(h2, lp["up_proj"]),
            lp["down_proj"],
        )
        xcat = xcat + mlp
        x = xcat[:B][:, None, :]
        x_chk = xcat[B:]
    if use_kernel:
        new = QuantKVCache(
            _upd_slot_all(new.k_q, [a[0] for a in appends], cur_lens),
            _upd_slot_all(new.k_s, [a[1] for a in appends], cur_lens),
            _upd_slot_all(new.v_q, [a[2] for a in appends], cur_lens),
            _upd_slot_all(new.v_s, [a[3] for a in appends], cur_lens),
        )
    if quant:
        new = _chunk_write_quant(new, cappend, cslot, dst)
    else:
        ck, cv = _chunk_write_dense(new.k, new.v, cappend, cslot, dst)
        new = LlamaKVCache(ck, cv)
    stage_k, stage_v = _stage_write(stage_k, stage_v, sappend, dst)
    xf = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    # prompt's last valid row (garbage unless this chunk completes a prompt)
    cf = rms_norm(x_chk[lastrow][None, None], params["norm"],
                  cfg.rms_norm_eps)
    rows = jnp.concatenate([xf[:, 0], cf[0]], axis=0)      # (B+1, D)
    logits = lm_logits(rows, params)
    return logits[:B], logits[B], new, (stage_k, stage_v)


@partial(jax.jit,
         static_argnames=("cfg", "k_steps", "P", "top_k", "sampling"),
         donate_argnums=(3, 4))
def _fused_tick(params, cfg: LlamaConfig, tokens, kv, stage, embq,
                cur_lens, starts, keys, temps,
                pidx, dsts, cslots, cpads, lastrows,
                k_steps: int, P: int, top_k: int, sampling: bool):
    """``k_steps`` fused steps in ONE dispatch. Per-step chunk descriptors
    (all (k_steps,) arrays; inactive steps use the scratch dst and the sink
    slot): ``pidx`` selects the prompt's row in the embedding queue,
    ``dsts`` the chunk offset, ``cslots`` the destination cache slot,
    ``cpads`` the prompt's left pad, ``lastrows`` the in-chunk index of the
    prompt's final token. Always unrolled (custom-call reads at a scan
    boundary copy the donated cache — ops/pallas_decode_attn.py).

    Returns (chunk tokens (k_steps, B), first-token ids (k_steps,), kv,
    stage, keys)."""
    out, firsts = [], []
    for s in range(k_steps):
        x_chk = jax.lax.dynamic_slice(
            embq, (pidx[s], dsts[s], 0), (1, P, embq.shape[2]))[0]
        logits, flogits, kv, stage = _fused_step(
            params, cfg, tokens, kv, stage, x_chk, cur_lens, starts,
            dsts[s], cslots[s], cpads[s], lastrows[s])
        tokens, keys = _sample_tokens(logits, keys, temps, top_k, sampling)
        cur_lens = cur_lens + 1
        out.append(tokens)
        firsts.append(jnp.argmax(flogits).astype(jnp.int32))
    return jnp.stack(out), jnp.stack(firsts), kv, stage, keys


def _fused_step_qwen(params, cfg, tokens, kv, stage, x_chk, ccos, csin,
                     cur_lens, starts, deltas, dst, cslot, cpad, lastrow):
    """Qwen2-VL fused step: same co-scheduling as ``_fused_step`` with the
    family's differences — M-RoPE (decode rows re-derive the shared-stream
    position ``cur_len - start + delta``; chunk rows consume the prompt's
    precomputed cos/sin slice), qkv biases, and the tuple dense cache."""
    from attwarp_tpu.models.qwen2vl import (
        _apply_rope,
        _attn as _qattn,
        mrope_cos_sin,
    )

    B = tokens.shape[0]
    P = x_chk.shape[0]
    quant = isinstance(kv, QuantKVCache)
    S = (kv.k_q if quant else kv[0]).shape[2]
    stage_k, stage_v = stage
    SK = stage_k.shape[1]
    H, kvH, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

    emb = params["text"]["embed_tokens"][tokens][:, None, :]
    p = (cur_lens - starts + deltas).astype(jnp.int32)
    pos3 = jnp.broadcast_to(p[None, :, None], (3, B, 1))
    cos, sin = mrope_cos_sin(pos3, cfg)
    g = dst + jnp.arange(P)
    ar = jnp.arange(S)[None, :]
    kv_mask = (ar >= starts[:, None]) & (ar <= cur_lens[:, None])
    cmask = _chunk_mask(SK, P, dst, cpad)

    x = emb
    x_c = x_chk
    new = kv
    cappend = []
    sappend = []
    use_kernel = quant and decode_attn_supported(S, kvH, hd, B)
    if use_kernel:
        strict = (ar >= starts[:, None]) & (ar < cur_lens[:, None])
        ksx, vsx, bias = prepare_decode_attn_operands(kv.k_s, kv.v_s, strict)
        appends = []
    for i, lp in enumerate(params["text"]["layers"]):
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        hc = rms_norm(x_c, lp["input_layernorm"], cfg.rms_norm_eps)
        hcat = jnp.concatenate([h[:, 0], hc], axis=0)[:, None, :]  # (B+P,1,D)
        qa = apply_linear(hcat[:, 0], lp["q_proj"])
        ka = apply_linear(hcat[:, 0], lp["k_proj"])
        va = apply_linear(hcat[:, 0], lp["v_proj"])
        q = qa[:B].reshape(B, 1, H, hd)
        k1 = ka[:B].reshape(B, 1, kvH, hd)
        v1 = va[:B].reshape(B, 1, kvH, hd)
        qc = qa[B:].reshape(1, P, H, hd)
        kc = ka[B:].reshape(1, P, kvH, hd)
        vc = va[B:].reshape(1, P, kvH, hd)
        q, k1 = _apply_rope(q, k1, cos, sin)
        qc, kc = _apply_rope(qc, kc, ccos[None], csin[None])
        # [staging history | fresh chunk] attention; all writes deferred
        # to the batched post-loop appends (see _chunk_mask/_stage_write)
        k_all = jnp.concatenate([stage_k[i][None].astype(kc.dtype), kc], 1)
        v_all = jnp.concatenate([stage_v[i][None].astype(vc.dtype), vc], 1)
        cattn, _ = _qattn(qc, k_all, v_all, cmask, cfg, want_probs=False)
        sappend.append((kc, vc))
        if quant:
            cappend.append((*quantize_kv(kc), *quantize_kv(vc)))
            k1q, k1s = quantize_kv(k1)
            v1q, v1s = quantize_kv(v1)
            if use_kernel:
                appends.append((k1q, k1s, v1q, v1s))
                attn = decode_attn_quantcache(
                    q, kv.k_q, ksx, kv.v_q, vsx, bias,
                    k1q, k1s, v1q, v1s,
                    num_heads=H,
                    sm_scale=1.0 / float(np.sqrt(hd)), layer=i,
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
            cappend.append((kc, vc))
            new = (
                _upd_slot(new[0], k1.astype(new[0].dtype), i, cur_lens),
                _upd_slot(new[1], v1.astype(new[1].dtype), i, cur_lens),
            )
            # the decode rows' attention reads the chunk's OWN slot rows
            # only if cslot is active — impossible mid-admission (the slot
            # activates after its last chunk), so the deferred write is
            # invisible to this read
            attn, _ = _qattn(q, new[0][i], new[1][i], kv_mask[:, None, :],
                             cfg, want_probs=False)
        acat = jnp.concatenate([attn[:, 0], cattn[0]], axis=0)
        xcat = jnp.concatenate([x[:, 0], x_c], axis=0)
        xcat = xcat + apply_linear(acat, lp["o_proj"])
        h2 = rms_norm(xcat, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        xcat = xcat + apply_linear(
            jax.nn.silu(apply_linear(h2, lp["gate_proj"]))
            * apply_linear(h2, lp["up_proj"]),
            lp["down_proj"],
        )
        x = xcat[:B][:, None, :]
        x_c = xcat[B:]
    if use_kernel:
        new = QuantKVCache(
            _upd_slot_all(new.k_q, [a[0] for a in appends], cur_lens),
            _upd_slot_all(new.k_s, [a[1] for a in appends], cur_lens),
            _upd_slot_all(new.v_q, [a[2] for a in appends], cur_lens),
            _upd_slot_all(new.v_s, [a[3] for a in appends], cur_lens),
        )
    if quant:
        new = _chunk_write_quant(new, cappend, cslot, dst)
    else:
        new = _chunk_write_dense(new[0], new[1], cappend, cslot, dst)
    stage_k, stage_v = _stage_write(stage_k, stage_v, sappend, dst)
    xf = rms_norm(x, params["text"]["norm"], cfg.rms_norm_eps)
    cf = rms_norm(x_c[lastrow][None, None], params["text"]["norm"],
                  cfg.rms_norm_eps)
    rows = jnp.concatenate([xf[:, 0], cf[0]], axis=0)
    logits = lm_logits(rows, params["text"])
    return logits[:B], logits[B], new, (stage_k, stage_v)


@partial(jax.jit,
         static_argnames=("cfg", "k_steps", "P", "top_k", "sampling"),
         donate_argnums=(3, 4))
def _fused_tick_qwen(params, cfg, tokens, kv, stage, embq, cosq, sinq,
                     cur_lens, starts, deltas, keys, temps,
                     pidx, dsts, cslots, cpads, lastrows,
                     k_steps: int, P: int, top_k: int, sampling: bool):
    """Qwen2-VL counterpart of ``_fused_tick`` (chunk rope slices come from
    the admission-time ``cosq``/``sinq`` queues)."""
    out, firsts = [], []
    D = embq.shape[2]
    hd = cosq.shape[2]
    for s in range(k_steps):
        x_chk = jax.lax.dynamic_slice(embq, (pidx[s], dsts[s], 0),
                                      (1, P, D))[0]
        ccos = jax.lax.dynamic_slice(cosq, (pidx[s], dsts[s], 0),
                                     (1, P, hd))[0]
        csin = jax.lax.dynamic_slice(sinq, (pidx[s], dsts[s], 0),
                                     (1, P, hd))[0]
        logits, flogits, kv, stage = _fused_step_qwen(
            params, cfg, tokens, kv, stage, x_chk, ccos, csin,
            cur_lens, starts, deltas, dsts[s], cslots[s], cpads[s],
            lastrows[s])
        tokens, keys = _sample_tokens(logits, keys, temps, top_k, sampling)
        cur_lens = cur_lens + 1
        out.append(tokens)
        firsts.append(jnp.argmax(flogits).astype(jnp.int32))
    return jnp.stack(out), jnp.stack(firsts), kv, stage, keys


# ── engine ──────────────────────────────────────────────────────────────


@dataclass
class _Admission:
    slot: int
    row: int                     # embedding-queue row
    req: Request
    Tb: int                      # bucketed prompt length
    pad: int                     # left pad inside the bucket
    next_dst: int = 0            # next chunk offset
    delta: int = 0               # qwen M-RoPE decode delta (re-based)
    first_token: Optional[int] = None   # set when the last chunk's step
    scheduled: List[int] = field(default_factory=list)


class ChunkedPrefillEngine(ServeEngine):
    """``ServeEngine`` whose admission prefill rides the decode ticks in
    P-token chunks instead of running dedicated prefill programs.

    Same request semantics and (for dense caches) the same greedy tokens
    as the base engine; under ``kv_quant`` the cache contents match the
    monolithic path exactly as well (see module docstring). Both model
    families serve: Qwen2-VL's M-RoPE tables are computed once per
    admission and sliced per chunk, and per-request admission needs no
    pixel-shape grouping at all (each prompt's vision grid compiles its
    own embed program, exactly like the base engine's per-(bucket, shape)
    groups).

    >>> eng = ChunkedPrefillEngine(model, slots=32, max_seq=832,
    ...                            kv_quant=True, prefill_chunk=128)
    """

    def __init__(self, model, slots: int = 8, prefill_chunk: int = 128,
                 stage_len: Optional[int] = None, embed_queue: int = 8,
                 **kw):
        # the pool carries one extra SINK slot: unconditional writes from
        # inactive chunk descriptors land there (never read)
        kw.pop("chunk_impl", None)
        super().__init__(model, slots=slots + 1, chunk_impl="unroll", **kw)
        self.n_real = slots
        self.P = prefill_chunk
        # stage_cap (= staging/write-through extent, a P-multiple) must not
        # exceed the cache length: dynamic_update_slice CLAMPS out-of-range
        # starts, which would shift a final chunk's cache write onto earlier
        # prompt positions
        stage_len = stage_len or (self.max_seq // self.P) * self.P
        assert stage_len <= self.max_seq, (stage_len, self.max_seq)
        self.stage_len = stage_len
        self.stage_cap = -(-stage_len // self.P) * self.P
        if self.stage_cap > self.max_seq:
            raise ValueError(
                f"ceil(stage_len/P)*P = {self.stage_cap} exceeds max_seq "
                f"{self.max_seq}; pick stage_len/prefill_chunk so the "
                f"chunk grid fits the cache")
        t = self.tcfg
        dt = self._cache_dtype()
        sk_shape = (t.num_hidden_layers, self.stage_cap + self.P,
                    t.kv_heads, t.head_dim)
        self.stage = (jnp.zeros(sk_shape, dt), jnp.zeros(sk_shape, dt))
        D = t.hidden_size
        self.embq = jnp.zeros((embed_queue, self.stage_cap, D), dt)
        if self.family == "qwen2vl":
            # admission-time M-RoPE cos/sin tables, sliced per chunk
            self.cosq = jnp.zeros((embed_queue, self.stage_cap, t.head_dim),
                                  dt)
            self.sinq = jnp.zeros_like(self.cosq)
        self._free_rows = deque(range(embed_queue))
        self._admitting: deque = deque()   # _Admission FIFO
        # free/pending slots park cur_lens OUT OF BOUNDS so their garbage
        # decode writes are scatter-dropped (never clamp-landed)
        self.cur_lens[:] = self.max_seq
        self.cur_lens[self.n_real] = self.max_seq   # sink: permanent

    # the base submit()'s bucket bound applies; chunked admission further
    # requires the bucketed prompt to fit the staging buffer
    def submit(self, input_ids, pixel_values=None, max_new_tokens: int = 64,
               temperature: float = 0.0) -> int:
        ids = np.asarray(input_ids).reshape(-1)
        Tb = -(-len(ids) // self.bucket) * self.bucket
        if Tb > self.stage_len:
            raise ValueError(
                f"prompt bucket {Tb} exceeds stage_len {self.stage_len}")
        return super().submit(input_ids, pixel_values, max_new_tokens,
                              temperature)

    def run(self) -> Dict[int, List[int]]:
        while (self.queue or self._admitting
               or any(s.active for s in self._slots[: self.n_real])):
            self._start_admissions()
            self._tick_fused()
        return self.results

    # ── internals ──────────────────────────────────────────────────────
    def _start_admissions(self):
        """Assign queued requests to (free slot, free embed-queue row) and
        dispatch their embedding programs (async). Chunks are scheduled by
        subsequent ticks."""
        while self.queue and self._free_rows:
            free = [b for b in range(self.n_real)
                    if not (self._slots[b].active or self._slots[b].pending)]
            if not free:
                return
            b = free[0]
            req = self.queue.popleft()
            row = self._free_rows.popleft()
            Tb = min(-(-len(req.input_ids) // self.bucket) * self.bucket,
                     self.max_seq)
            pad = Tb - len(req.input_ids)
            ids = np.zeros((1, Tb), np.int64)
            ids[0, pad:] = req.input_ids
            with_image = req.pixel_values is not None
            adm = _Admission(b, row, req, Tb, pad)
            if self.family == "qwen2vl":
                from attwarp_tpu.models.qwen2vl import (
                    get_mrope_positions,
                    patchify_image,
                )

                if with_image:
                    pats, grid = patchify_image(req.pixel_values,
                                                self.cfg.vision)
                    patches = jnp.asarray(pats[None])
                else:
                    patches, grid = jnp.zeros((1, 4, 8), jnp.float32), None
                mask = np.zeros((1, Tb), np.int64)
                mask[0, pad:] = 1
                pos, deltas = get_mrope_positions(
                    ids, mask, grid or (1, 2, 2),
                    self.cfg.image_token_id,
                    self.cfg.vision.spatial_merge_size,
                )
                # decode positions re-base the delta to VALID length
                adm.delta = int(deltas[0]) + pad
                e, c, s = _embed_prompt_qwen(
                    self.model.params, self.cfg, self.tcfg,
                    jnp.asarray(ids), patches, jnp.asarray(pos), grid,
                    self.stage_cap)
                self.embq, self.cosq, self.sinq = _embq_insert_qwen(
                    self.embq, self.cosq, self.sinq, e, c, s, row)
            else:
                pixels = (jnp.asarray(req.pixel_values, jnp.float32)[None]
                          if with_image
                          else jnp.zeros((1, 1, 1, 3), jnp.float32))
                e = _embed_prompt(self.model.params, self.cfg,
                                  jnp.asarray(ids), pixels, with_image,
                                  self.stage_cap)
                self.embq = _embq_insert(self.embq, e, row)
            self._slots[b].pending = True
            self._slots[b].rid = req.rid
            self.cur_lens[b] = self.max_seq      # drop garbage decode writes
            self.starts[b] = 0
            self._admitting.append(adm)

    def _build_schedule(self):
        """One chunk descriptor per step, FIFO and contiguous per prompt.
        Inactive steps write to the scratch dst and the sink slot."""
        K, P = self.steps_per_tick, self.P
        pidx = np.zeros(K, np.int32)
        dsts = np.full(K, self.stage_cap, np.int32)       # scratch
        cslots = np.full(K, self.n_real, np.int32)        # sink
        cpads = np.zeros(K, np.int32)
        lastrows = np.zeros(K, np.int32)
        completes: List[tuple] = []     # (step, _Admission)
        ai = 0
        admissions = list(self._admitting)
        for s in range(K):
            while ai < len(admissions) and \
                    admissions[ai].next_dst >= admissions[ai].Tb:
                ai += 1
            if ai >= len(admissions):
                break
            a = admissions[ai]
            pidx[s] = a.row
            dsts[s] = a.next_dst
            cslots[s] = a.slot
            cpads[s] = a.pad
            lastrows[s] = min(a.Tb - 1 - a.next_dst, P - 1)
            a.next_dst += P
            if a.next_dst >= a.Tb:
                completes.append((s, a))
        return pidx, dsts, cslots, cpads, lastrows, completes

    def _tick_fused(self):
        import time as _time

        K = self.steps_per_tick
        pidx, dsts, cslots, cpads, lastrows, completes = \
            self._build_schedule()
        sampling = bool((self.temps > 0).any())
        if self.family == "qwen2vl":
            chunk, firsts, self.kv, self.stage, keys = _fused_tick_qwen(
                self.model.params, self.tcfg,
                jnp.asarray(self.tokens), self.kv, self.stage, self.embq,
                self.cosq, self.sinq,
                jnp.asarray(self.cur_lens), jnp.asarray(self.starts),
                jnp.asarray(self.deltas),
                jnp.asarray(self.keys), jnp.asarray(self.temps),
                jnp.asarray(pidx), jnp.asarray(dsts), jnp.asarray(cslots),
                jnp.asarray(cpads), jnp.asarray(lastrows),
                K, self.P, self.top_k, sampling,
            )
        else:
            chunk, firsts, self.kv, self.stage, keys = _fused_tick(
                self.model.params["llama"], self.tcfg,
                jnp.asarray(self.tokens), self.kv, self.stage, self.embq,
                jnp.asarray(self.cur_lens), jnp.asarray(self.starts),
                jnp.asarray(self.keys), jnp.asarray(self.temps),
                jnp.asarray(pidx), jnp.asarray(dsts), jnp.asarray(cslots),
                jnp.asarray(cpads), jnp.asarray(lastrows),
                K, self.P, self.top_k, sampling,
            )
        self.keys = np.array(keys)
        chunk, firsts = jax.device_get((chunk, firsts))
        chunk = np.asarray(chunk)
        # harvest decode rows (real slots only; the sink never activates)
        took = {}
        for b in range(self.n_real):
            slot = self._slots[b]
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
                    finished = True
                    break
            took[slot.rid] = consumed
            self.cur_lens[b] += K
            self.tokens[b] = int(chunk[K - 1, b])
            if finished or self.cur_lens[b] + K >= self.max_seq:
                self._retire(b)
        self.tick_log.append((_time.perf_counter(), took))
        # activate admissions whose last chunk rode this tick
        now = _time.perf_counter()
        for s, a in completes:
            tok = int(firsts[s])
            b = a.slot
            slot = self._slots[b]
            self.tokens[b] = tok
            self.cur_lens[b] = a.Tb
            self.starts[b] = a.pad
            self.deltas[b] = a.delta
            self.temps[b] = a.req.temperature
            self.keys[b] = np.asarray(
                jax.random.fold_in(self._base_key, a.req.rid), np.uint32)
            self.request_stats[a.req.rid]["first_token"] = now
            slot.generated = [tok]
            slot.remaining = a.req.max_new_tokens - 1
            slot.pending = False
            slot.active = True
            self._free_rows.append(a.row)
            self._admitting.remove(a)
            if tok == self.cfg.eos_token_id or slot.remaining <= 0:
                self._retire(b)

    def _retire(self, b: int):
        super()._retire(b)
        # park the freed slot's write position out of bounds (see __init__)
        self.cur_lens[b] = self.max_seq

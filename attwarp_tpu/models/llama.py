"""LLaMA decoder in functional JAX.

Architecture parity with HuggingFace ``LlamaModel`` (the LLM inside
LLaVA-1.5; reference L1 — SURVEY §1): RMSNorm, rotary position embeddings,
grouped-query attention, SwiGLU MLP, tied or untied LM head.

TPU-native specifics:
- The decode loop is caller-owned (``lax.scan`` in the LLaVA wrapper); this
  module exposes ``llama_prefill`` (full-sequence) and ``llama_decode_step``
  (single token against a KV cache) as pure functions over a parameter
  pytree.
- ``extract_layer`` makes THAT layer return its post-softmax attention row
  for the last query position — the functional replacement for the
  reference's forward hook + per-layer monkey-patch (llava.py:141-147,
  422-438). Other layers never materialize attention probabilities
  (softmax(qk) is fused by XLA into the attention computation).
- Weights stay f32; activations can be bf16 via ``compute_dtype``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.numerics.quant import apply_linear, lm_logits, quantize_kv
from attwarp_tpu.ops.pallas_decode_attn import (
    decode_attn_bias,
    decode_attn_quantcache,
    decode_attn_supported,
    prepare_decode_attn_operands,
)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None  # None -> MHA
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads


class LlamaKVCache(NamedTuple):
    k: jnp.ndarray  # (n_layers, B, max_seq, kv_heads, head_dim)
    v: jnp.ndarray


class QuantKVCache(NamedTuple):
    """int8 KV cache: values + per-(token, head) f32 scales
    (numerics/quant.py::quantize_kv). Half the HBM of bf16 / a quarter of
    f32 — the decode step streams the whole cache every token, so this
    directly lifts batch capacity and decode throughput at 7B serving."""

    k_q: jnp.ndarray  # int8 (n_layers, B, max_seq, kv_heads, head_dim)
    k_s: jnp.ndarray  # f32  (n_layers, B, max_seq, kv_heads)
    v_q: jnp.ndarray
    v_s: jnp.ndarray


def init_kv_cache(cfg: LlamaConfig, batch: int, max_seq: int, dtype=jnp.float32) -> LlamaKVCache:
    shape = (cfg.num_hidden_layers, batch, max_seq, cfg.kv_heads, cfg.head_dim)
    return LlamaKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def init_quant_kv_cache(cfg: LlamaConfig, batch: int, max_seq: int) -> QuantKVCache:
    shape = (cfg.num_hidden_layers, batch, max_seq, cfg.kv_heads, cfg.head_dim)
    return QuantKVCache(
        jnp.zeros(shape, jnp.int8), jnp.zeros(shape[:-1], jnp.float32),
        jnp.zeros(shape, jnp.int8), jnp.zeros(shape[:-1], jnp.float32),
    )


def make_decode_prep(kv):
    """Pre-flattened flash-decoding scale operands for a multi-step decode
    chain: the (L, B, S, kvH) -> (L, B, 1, S*kvH) relayout the kernel
    needs, paid ONCE per jitted chain instead of once per step (the
    measured ~0.9 ms/step prep term at LLaVA B=32,
    eval_results/decode_terms_llava_b32.json). Pass the result as ``prep=``
    to the decode steps, which return it incrementally appended (the new
    token's scales land via one tiny dynamic_update_slice). Returns None
    for dense caches."""
    if not isinstance(kv, QuantKVCache):
        return None
    L, B, S, kvH = kv.k_s.shape
    return (kv.k_s.reshape(L, B, 1, S * kvH),
            kv.v_s.reshape(L, B, 1, S * kvH))


def append_decode_quant(kv0, appends, cur_len, kv_heads: int, prep):
    """Kernel-path epilogue shared by both model families (llama_decode_step
    and qwen2vl_decode_step): ONE batched dynamic_update_slice writes every
    layer's new-token K/V (+ per-(token, head) scales) into the step-entry
    cache at ``cur_len`` — after the last stale kernel read, so the
    donated cache's in-place update chain is never raced — and, when a
    carried ``prep`` is threaded, appends the same scales into its flat
    (L, B, 1, S*kvH) layout with one tiny dus (never the full relayout).

    ``appends``: per-layer (k_q, k_s, v_q, v_s) for the current token.
    Returns (kv, prep)."""
    def app(cache, xs):
        zeros = (0,) * (cache.ndim - 3)
        return jax.lax.dynamic_update_slice(
            cache, jnp.stack(xs), (0, 0, cur_len, *zeros))

    kv = QuantKVCache(
        app(kv0.k_q, [a[0] for a in appends]),
        app(kv0.k_s, [a[1] for a in appends]),
        app(kv0.v_q, [a[2] for a in appends]),
        app(kv0.v_s, [a[3] for a in appends]),
    )
    if prep is not None:
        ksx, vsx = prep
        prep = (
            jax.lax.dynamic_update_slice(
                ksx, jnp.stack([a[1] for a in appends]),
                (0, 0, 0, cur_len * kv_heads)),
            jax.lax.dynamic_update_slice(
                vsx, jnp.stack([a[3] for a in appends]),
                (0, 0, 0, cur_len * kv_heads)),
        )
    return kv, prep


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions (...,) -> (cos, sin) of shape (..., head_dim) (HF layout:
    inv_freq over even indices, duplicated across both halves)."""
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q, k: (B, T, H, hd); cos, sin: (B, T, hd) or (T, hd)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    # keep activations in their compute dtype (bf16 serving should not be
    # silently promoted to f32 by the f32 rope tables)
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, T, kv_heads, hd) -> (B, T, kv_heads*n_rep, hd)."""
    if n_rep == 1:
        return x
    B, T, H, D = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (B, T, H, n_rep, D)).reshape(
        B, T, H * n_rep, D
    )


def _attn(q, k, v, mask, cfg: LlamaConfig, want_probs: bool):
    """q (B,Tq,H,hd), k/v (B,Tk,kvH,hd), mask (B,Tq,Tk) bool."""
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    scale = 1.0 / np.sqrt(cfg.head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    logits = jnp.where(mask[:, None, :, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    B, Tq = out.shape[0], out.shape[1]
    out = out.reshape(B, Tq, cfg.hidden_size)
    return out, (probs[:, :, -1, :] if want_probs else None)


def _flash_kv_block(T: int, cap: int = 512) -> int:
    """Largest power-of-two divisor of the (static) sequence length, capped.
    The flash kernel requires block_k | kv_seq_len; prompt lengths are
    64-token-bucketed (extract/offsets.py), so this is ≥64 in practice."""
    b = 1
    while T % (b * 2) == 0 and (b * 2) <= cap:
        b *= 2
    return b


def flash_prefill_supported(T: int) -> bool:
    """Flash engages for sequences long enough to tile efficiently; shorter
    prompts silently use the dense path (same numerics contract)."""
    return T >= 256 and _flash_kv_block(T) >= 64


def _flash_attn(q, k, v, attention_mask, cfg: LlamaConfig):
    """Prefill attention through the Pallas flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention): O(T) memory, no
    materialized (T, T) probability matrix. Left padding is encoded as
    segment ids (padding = segment 1, valid = segment 2) so valid queries
    never attend padding. TPU-only fast path."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, T = attention_mask.shape
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    seg = jnp.where(attention_mask, 2, 1).astype(jnp.int32)  # padding=1, valid=2
    bk = _flash_kv_block(T)
    blocks = BlockSizes(
        block_q=min(512, T),
        block_k_major=bk,
        block_k=bk,
        block_b=1,
    )
    out = flash_attention(
        q.transpose(0, 2, 1, 3),  # (B, H, T, hd)
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=True,
        sm_scale=1.0 / np.sqrt(cfg.head_dim),
        block_sizes=blocks,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, T, cfg.hidden_size)


def _attn_quantcache(q, k_q, k_s, v_q, v_s, mask, cfg: LlamaConfig, want_probs):
    """Decode attention directly against the int8 cache.

    Mathematically identical to dequantize-then-attend, but the scales are
    factored OUT of the matmul operands: scores = (q · k_q) ⊙ k_s and
    out = (probs ⊙ v_s) · v_q. The dots then consume a pure int8→dtype
    convert, which XLA fuses into the matmul operand load at every batch
    size — the fused-multiply dequant form stopped fusing at B=16 and
    materialized a bf16 cache copy per layer (measured 3.3× step-time
    regression; ARCHITECTURE.md)."""
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    k_q = _repeat_kv(k_q, n_rep)              # (B, S, H, hd) int8
    v_q = _repeat_kv(v_q, n_rep)
    k_s = _repeat_kv(k_s[..., None], n_rep)[..., 0]   # (B, S, H)
    v_s = _repeat_kv(v_s[..., None], n_rep)[..., 0]
    scale = 1.0 / np.sqrt(cfg.head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_q.astype(q.dtype))
    logits = logits.astype(jnp.float32) * jnp.transpose(k_s, (0, 2, 1))[:, :, None, :]
    logits = logits * scale
    logits = jnp.where(mask[:, None, :, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs * jnp.transpose(v_s, (0, 2, 1))[:, :, None, :]
    out = jnp.einsum("bhqk,bkhd->bqhd", pv.astype(q.dtype), v_q.astype(q.dtype))
    B, Tq = out.shape[0], out.shape[1]
    out = out.reshape(B, Tq, cfg.hidden_size)
    return out, (probs[:, :, -1, :] if want_probs else None)


def _last_row_probs(q_last, k, mask_last, cfg: LlamaConfig):
    """Post-softmax attention of the LAST query position only: (B, H, T).
    O(B*H*T) — this is all the extract layer needs, so with flash attention
    enabled no layer ever materializes a (T, T) probability matrix."""
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    k = _repeat_kv(k, n_rep)
    scale = 1.0 / np.sqrt(cfg.head_dim)
    logits = jnp.einsum("bhd,bkhd->bhk", q_last, k).astype(jnp.float32) * scale
    logits = jnp.where(mask_last[:, None, :], logits, jnp.finfo(jnp.float32).min)
    return jax.nn.softmax(logits, axis=-1)


def extract_layers_tuple(extract_layer) -> Tuple[int, ...]:
    """Normalize an extract-layer spec (None | int | sequence of ints) to a
    tuple. Multi-layer extraction returns one attention row per listed layer
    in ONE forward pass — the reference's multilayer training data
    (config.py:15-17 ``*_qwen_multilayer`` roots) needs maps from several
    layers per sample, which would otherwise cost one generate per layer."""
    if extract_layer is None:
        return ()
    if isinstance(extract_layer, int):
        return (extract_layer,)
    return tuple(extract_layer)


def _stack_rows(rows: Dict[int, jnp.ndarray], extract_layer):
    """Match the row container to the spec: None -> None, int -> (B, H, T),
    tuple -> (L, B, H, T) in spec order."""
    if extract_layer is None:
        return None
    want = extract_layers_tuple(extract_layer)
    missing = [l for l in want if l not in rows]
    if missing:
        raise ValueError(
            f"extract_layer {missing} out of range (no such decoder layer)"
        )
    if isinstance(extract_layer, int):
        return rows[extract_layer]
    return jnp.stack([rows[l] for l in extract_layer])


def _layer(lp: Dict[str, Any], cfg: LlamaConfig, x, cos, sin, mask, want_probs,
           use_flash=False, attention_mask=None):
    """Full-sequence layer forward. Returns (y, k, v, probs_row)."""
    B, T, _ = x.shape
    h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
    q = apply_linear(h, lp["q_proj"]).reshape(B, T, cfg.num_attention_heads, cfg.head_dim)
    k = apply_linear(h, lp["k_proj"]).reshape(B, T, cfg.kv_heads, cfg.head_dim)
    v = apply_linear(h, lp["v_proj"]).reshape(B, T, cfg.kv_heads, cfg.head_dim)
    q, k = apply_rope(q, k, cos, sin)
    if use_flash and flash_prefill_supported(T):
        attn = _flash_attn(q, k, v, attention_mask, cfg)
        row = (
            _last_row_probs(q[:, -1], k, mask[:, -1, :], cfg) if want_probs else None
        )
    else:
        attn, row = _attn(q, k, v, mask, cfg, want_probs)
    x = x + apply_linear(attn, lp["o_proj"])
    h2 = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    mlp = apply_linear(
        jax.nn.silu(apply_linear(h2, lp["gate_proj"])) * apply_linear(h2, lp["up_proj"]),
        lp["down_proj"],
    )
    return x + mlp, k, v, row


def llama_prefill(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,    # (B, T, D)
    attention_mask: jnp.ndarray,   # (B, T) bool (False on left padding)
    max_seq: int,
    extract_layer: Optional[int] = None,
    use_flash: bool = False,
    kv_quant: bool = False,
):
    """Full-prompt forward. Returns (last_logits (B, vocab), kv cache padded
    to max_seq, extract_row (B, H, T) or None).

    ``kv_quant`` stores the cache as int8 (``QuantKVCache``); the prefill's
    OWN attention still uses the exact keys/values, so prefill logits and the
    extract row are bit-identical to the dense-cache path — only the decode
    steps read quantized history.

    ``use_flash`` routes attention through the Pallas flash kernel (TPU
    only); the extract layer's last-row probabilities are computed by a
    separate O(T) pass, so no (T, T) matrix is ever materialized. Measured
    on v5e at 7B shape (tools/bench_prefill.py): at LLaVA's 640-token
    extraction prompt the dense path is MXU-bound at ~75% of bf16 peak and
    slightly ahead (54.9 vs 61.1 ms at B=1); flash overtakes between 1k–2k
    tokens (350 vs 575 ms at B=2 T=2048) and keeps running at T=4096 where
    dense OOMs on the (T, T) tensor. The flash kernel computes in bf16
    (logits within ~0.7% relative; the extract row within 5e-5), so the
    default stays the dense f32 path; prompts under 256 tokens always use
    dense (``flash_prefill_supported``)."""
    B, T, _ = inputs_embeds.shape
    # HF left-padding convention: position ids count valid tokens
    positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1
    positions = jnp.clip(positions, 0, None)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((T, T), bool))[None]
    mask = jnp.logical_and(causal, attention_mask[:, None, :])

    x = inputs_embeds
    want = extract_layers_tuple(extract_layer)
    ks, vs, rows = [], [], {}
    for i, lp in enumerate(params["layers"]):
        x, k, v, r = _layer(
            lp, cfg, x, cos, sin, mask, want_probs=(i in want),
            use_flash=use_flash, attention_mask=attention_mask,
        )
        if r is not None:
            rows[i] = r
        pad = max_seq - T
        if kv_quant:
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            ks.append((
                jnp.pad(kq, ((0, 0), (0, pad), (0, 0), (0, 0))),
                jnp.pad(ksc, ((0, 0), (0, pad), (0, 0))),
            ))
            vs.append((
                jnp.pad(vq, ((0, 0), (0, pad), (0, 0), (0, 0))),
                jnp.pad(vsc, ((0, 0), (0, pad), (0, 0))),
            ))
        else:
            ks.append(jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))))
            vs.append(jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))))
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = lm_logits(x[:, -1], params)
    if kv_quant:
        cache = QuantKVCache(
            jnp.stack([a for a, _ in ks]), jnp.stack([b for _, b in ks]),
            jnp.stack([a for a, _ in vs]), jnp.stack([b for _, b in vs]),
        )
    else:
        cache = LlamaKVCache(jnp.stack(ks), jnp.stack(vs))
    return logits, cache, _stack_rows(rows, extract_layer)


def llama_decode_step(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    token_embeds: jnp.ndarray,     # (B, 1, D)
    kv,                            # LlamaKVCache | QuantKVCache
    cur_len: jnp.ndarray,          # scalar int: write position in the cache
    positions: jnp.ndarray,        # (B,) rope position of the new token
    kv_mask: jnp.ndarray,          # (B, max_seq) bool incl. the new slot
    extract_layer: Optional[int] = None,
    prep=None,                     # from make_decode_prep (quant chains)
):
    """Single-token step against the cache. Returns (logits, new_kv, row),
    plus the appended ``prep`` as a fourth element when one was passed
    (multi-step chains thread it so the kernel's scale relayout is paid
    once per chain — see ``make_decode_prep``).

    ``kv`` may be a dense ``LlamaKVCache`` or an int8 ``QuantKVCache``
    (dispatch is on the pytree type, static at trace time). The quantized
    path writes the new token's int8 slot + scale and dequantizes inside the
    attention read — XLA fuses the per-slot multiply into the einsum, so HBM
    traffic per step is the int8 cache, not a bf16 rematerialization.

    Cache updates are ``dynamic_update_slice`` on the stacked (L, B, S, H, D)
    arrays — a chain XLA executes in place inside the caller's decode scan.
    (The earlier per-layer list + ``jnp.stack`` form rewrote the ENTIRE
    cache every token and kept two copies alive across the scan carry —
    both the extra full-cache HBM write per step and the 2x memory are
    gone; this is what moves the 7B serving batch ceiling.)"""
    B = token_embeds.shape[0]
    cos, sin = rope_cos_sin(positions[:, None], cfg.head_dim, cfg.rope_theta)
    x = token_embeds
    want = extract_layers_tuple(extract_layer)
    quant = isinstance(kv, QuantKVCache)

    def upd(cache, new, layer):
        # write (B, 1, ...) at [layer, :, cur_len]
        zeros = (0,) * (cache.ndim - 3)
        return jax.lax.dynamic_update_slice(
            cache, new[None], (layer, 0, cur_len, *zeros)
        )

    # Pallas flash-decoding step (ops/pallas_decode_attn.py): every layer
    # reads the STEP-ENTRY cache (stale at cur_len; the current token is
    # merged outside the kernel) so the in-place update chain never races a
    # custom-call read, and all layers' new K/V append in ONE batched
    # dynamic_update_slice at the end. Outside the kernel's win region the
    # round-2 XLA ladder stands: scale-factored at B>=16, fused dequant
    # below (tools/bench_decode.py). B and shapes are static at trace time.
    use_kernel = quant and decode_attn_supported(
        kv.k_q.shape[2], cfg.kv_heads, cfg.head_dim, B)
    if use_kernel:
        kv0, S = kv, kv.k_q.shape[2]
        strict = kv_mask & (jnp.arange(S)[None, :] != cur_len)
        if prep is not None:
            ksx, vsx = prep
            bias = decode_attn_bias(strict, cfg.kv_heads)
        else:
            ksx, vsx, bias = prepare_decode_attn_operands(
                kv0.k_s, kv0.v_s, strict)
        appends = []

        def plane(cache, new):
            # one extract layer's post-update plane (copies that plane —
            # only paid for layers that need the probs row)
            zeros = (0,) * (cache.ndim - 2)
            return jax.lax.dynamic_update_slice(
                cache, new, (0, cur_len, *zeros))

    rows = {}
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
                if i not in want:
                    attn = decode_attn_quantcache(
                        q, kv0.k_q, ksx, kv0.v_q, vsx, bias,
                        k1q, k1s, v1q, v1s,
                        num_heads=cfg.num_attention_heads,
                        sm_scale=1.0 / float(np.sqrt(cfg.head_dim)),
                        layer=i,
                    )
                    r = None
                else:
                    # probs row needed: XLA form on this layer's
                    # post-update plane
                    attn, r = _attn_quantcache(
                        q, plane(kv0.k_q[i], k1q), plane(kv0.k_s[i], k1s),
                        plane(kv0.v_q[i], v1q), plane(kv0.v_s[i], v1s),
                        kv_mask[:, None, :], cfg, want_probs=True,
                    )
            elif B >= 16:
                kv = QuantKVCache(
                    upd(kv.k_q, k1q, i), upd(kv.k_s, k1s, i),
                    upd(kv.v_q, v1q, i), upd(kv.v_s, v1s, i),
                )
                attn, r = _attn_quantcache(
                    q, kv.k_q[i], kv.k_s[i], kv.v_q[i], kv.v_s[i],
                    kv_mask[:, None, :], cfg, want_probs=(i in want),
                )
            else:
                from attwarp_tpu.numerics.quant import dequantize_kv

                kv = QuantKVCache(
                    upd(kv.k_q, k1q, i), upd(kv.k_s, k1s, i),
                    upd(kv.v_q, v1q, i), upd(kv.v_s, v1s, i),
                )
                k = dequantize_kv(kv.k_q[i], kv.k_s[i], q.dtype)
                v = dequantize_kv(kv.v_q[i], kv.v_s[i], q.dtype)
                attn, r = _attn(q, k, v, kv_mask[:, None, :], cfg,
                                want_probs=(i in want))
        else:
            kv = LlamaKVCache(upd(kv.k, k1, i), upd(kv.v, v1, i))
            attn, r = _attn(q, kv.k[i], kv.v[i], kv_mask[:, None, :], cfg,
                            want_probs=(i in want))
        if r is not None:
            rows[i] = r
        x = x + apply_linear(attn, lp["o_proj"])
        h2 = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        mlp = apply_linear(
            jax.nn.silu(apply_linear(h2, lp["gate_proj"])) * apply_linear(h2, lp["up_proj"]),
            lp["down_proj"],
        )
        x = x + mlp
    if quant and use_kernel:
        kv, prep = append_decode_quant(
            kv0, appends, cur_len, cfg.kv_heads, prep)
    elif prep is not None:
        # off-kernel step with a carried prep: keep it consistent with the
        # updated cache (this path is CPU/fallback only — the relayout
        # the carry exists to avoid is cheap there)
        prep = make_decode_prep(kv)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = lm_logits(x[:, 0], params)
    row = _stack_rows(rows, extract_layer)
    if prep is not None:
        return logits, kv, row, prep
    return logits, kv, row

"""Sequence-parallel (context-parallel) prefill: ring attention over a mesh
axis.

WHY. Prefill time and memory scale with prompt length; one chip tops out
around T=4096 at 7B (the dense (T, T) score tensor OOMs — measured,
ARCHITECTURE.md) and the flash kernel only fixes memory, not time. For the
long-multimodal-prompt regime the TPU-native answer is to shard the
SEQUENCE dimension across chips: each of n devices holds T/n tokens'
activations, runs every projection/MLP on its local slice (n× less compute
and memory per chip), and attention sees the full history by rotating K/V
blocks around the ICI ring — `jax.lax.ppermute` inside `shard_map`, the
standard TPU context-parallel pattern (scaling-book; Ring Attention,
Liu et al. 2023).

HOW. Per layer, each shard computes its local q/k/v (+rope at GLOBAL
positions, sliced before the shard_map), then n ring steps: attend the
local queries against the CURRENT resident K/V block with a flash-style
streaming softmax (running row max `m`, denominator `l`, accumulator in
f32 — numerics identical to one softmax over the full row), then pass the
block to the next device on the ring. Causality is enforced by ABSOLUTE
sequence index (the same `tril` the dense path uses) and left padding by
the key-validity bits that travel with each block, so masking is exact for
any shard count. Compute per chip: (T/n)·T scores per layer — n× less than
dense; resident memory per chip: one (T/n) K/V block per ring step.

The contract mirrors `llama_prefill` (models/llama.py:296): returns
(last_logits (B, vocab), LlamaKVCache padded to max_seq, extract rows).
The cache's sequence axis is materialized FULL on the output (gathered by
the out_specs) so the existing decode step consumes it unchanged; the
extract row (the reference hook's product — `new_method.py` getmask path)
costs one all-gather of that layer's K, O(T) not O(T²).

Parity pinned by tests/test_sp_prefill.py: logits + cache + extract rows
vs `llama_prefill` on an 8-device CPU mesh, with and without left padding,
n=2/4/8.

Pad-position caveat: at left-pad query positions (no visible key anywhere)
the ring path emits exact zeros where the dense path emits a softmax over
an all-masked row — so activations and cache entries AT PAD SLOTS differ
between the two paths by construction. They are never parity-checked and
must stay masked downstream (the decode steps' `kv_mask` already does).

``kv_quant=True`` returns a `QuantKVCache` (int8 + per-(token, head) f32
scales), quantized per shard-local block INSIDE the shard_map — exactly
equal to quantizing the gathered cache, since the scale granularity never
crosses a token — so serving callers get drop-in parity with
`llama_prefill(kv_quant=True)` without a second full-cache HBM pass.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from attwarp_tpu.models.llama import (
    LlamaConfig,
    LlamaKVCache,
    QuantKVCache,
    _last_row_probs,
    _repeat_kv,
    _stack_rows,
    apply_rope,
    extract_layers_tuple,
    rms_norm,
    rope_cos_sin,
)
from attwarp_tpu.numerics.quant import apply_linear, lm_logits, quantize_kv


def _check_max_seq(max_seq: Optional[int], T: int) -> int:
    """Validate the cache length up front (a too-small max_seq would only
    surface later as a cryptic negative-padding error inside jnp.pad)."""
    if max_seq is None:
        return T
    if max_seq < T:
        raise ValueError(f"max_seq={max_seq} < prompt length T={T}")
    return max_seq

_NEG = jnp.finfo(jnp.float32).min


def _ring_attn(q, k, v, q_idx, k_idx, k_valid, cfg: LlamaConfig, axis: str):
    """Streaming-softmax attention of local queries over the full (ring)
    sequence. q: (B, Tl, H, hd); k/v: (B, Tl, kvH, hd) local block;
    q_idx/k_idx: (Tl,) absolute positions; k_valid: (B, Tl) bool.
    Returns (B, Tl, H*hd) in q.dtype, plus the full-row softmax inputs are
    never materialized — each ring step scores one (Tl, Tl) block."""
    n = jax.lax.psum(1, axis)
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    scale = 1.0 / np.sqrt(cfg.head_dim)
    B, Tl, H, hd = q.shape

    m = jnp.full((B, H, Tl), _NEG, jnp.float32)        # running row max
    l = jnp.zeros((B, H, Tl), jnp.float32)             # running denominator
    acc = jnp.zeros((B, H, Tl, hd), jnp.float32)       # running numerator

    blk = (k, v, k_idx, k_valid)
    perm = [(i, (i + 1) % n) for i in range(n)]
    for _ in range(n):
        kb, vb, kib, kvb = blk
        kr = _repeat_kv(kb, n_rep)
        vr = _repeat_kv(vb, n_rep)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kr).astype(jnp.float32) * scale
        ok = (kib[None, :] <= q_idx[:, None])[None, None]      # causal, abs idx
        ok = jnp.logical_and(ok, kvb[:, None, None, :])        # padding
        s = jnp.where(ok, s, _NEG)
        bm = jnp.max(s, axis=-1)                               # (B, H, Tl)
        nm = jnp.maximum(m, bm)
        # rows with no visible key anywhere so far keep m=_NEG; exp(s-_NEG)
        # would overflow, so renormalize against a safe max
        sm = jnp.where(nm == _NEG, 0.0, nm)
        p = jnp.exp(s - sm[..., None])
        p = jnp.where(ok, p, 0.0)
        corr = jnp.where(m == _NEG, 0.0, jnp.exp(m - sm))
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vr.astype(jnp.float32))
        m = nm
        blk = jax.lax.ppermute(blk, axis, perm)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).reshape(B, Tl, H * hd).astype(q.dtype)


def sp_prefill_qwen(
    params: Dict[str, Any],
    cfg,                            # Qwen2VLTextConfig
    inputs_embeds: jnp.ndarray,     # (B, T, D)
    attention_mask: jnp.ndarray,    # (B, T) bool
    cos: jnp.ndarray,               # (B, T, head_dim) M-RoPE tables
    sin: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    max_seq: Optional[int] = None,
    extract_layer=None,
    kv_quant: bool = False,
):
    """Sequence-parallel `qwen2vl_prefill` (models/qwen2vl.py:314): the same
    ring-attention schedule as `sp_prefill`, for the second model family.

    M-RoPE only changes the cos/sin applied to q/k BEFORE attention — the
    caller passes the full-prompt (B, T, head_dim) tables (from
    `get_mrope_positions` + `mrope_cos_sin`, exactly the dense prefill's
    contract) and they shard with the embeds; the ring itself is
    family-agnostic (`_ring_attn` reads only H/kvH/head_dim from the
    config). Qwen2's q/k/v biases ride through `apply_linear`. Returns the
    dense-path contract: (last logits, (k, v) stacked (L, B, max_seq, kvH,
    hd) cache, extract rows) — the cache feeds `qwen2vl_decode_step`
    unchanged, or a `QuantKVCache` with ``kv_quant=True`` (quantized on the
    local shard inside the shard_map; exact vs quantizing the full cache).
    Parity: tests/test_sp_prefill.py::test_sp_qwen_*.
    """
    from attwarp_tpu.models.qwen2vl import _apply_rope as qwen_rope
    from attwarp_tpu.models.qwen2vl import _mlp as qwen_mlp
    from attwarp_tpu.models.qwen2vl import _qkv as qwen_qkv

    B, T, D = inputs_embeds.shape
    n = mesh.shape[axis]
    if T % n:
        raise ValueError(f"prompt length {T} not divisible by {axis}={n}")
    max_seq = _check_max_seq(max_seq, T)
    want = extract_layers_tuple(extract_layer)
    abs_idx = jnp.arange(T, dtype=jnp.int32)

    blk5 = P(None, None, axis, None, None)   # (L, B, Tl, kvH, hd)
    blk4 = P(None, None, axis, None)         # (L, B, Tl, kvH) scales
    cache_spec = ((blk5, blk4) * 2) if kv_quant else (blk5,) * 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), params),
            P(None, axis, None),     # embeds: sequence-sharded
            P(None, axis),           # mask
            P(None, axis, None),     # cos
            P(None, axis, None),     # sin
            P(axis),                 # absolute indices
        ),
        out_specs=(
            P(),                     # last logits
            cache_spec,              # cache k, v (+ scales when quantized)
            P(),                     # extract rows
        ),
        check_vma=False,
    )
    def run(pp, emb, msk, cosl, sinl, aidx):
        x = emb
        ks, vs = [], []
        rows = {}
        for i, lp in enumerate(pp["layers"]):
            h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            q, k, v = qwen_qkv(lp, cfg, h)
            q, k = qwen_rope(q, k, cosl, sinl)
            attn = _ring_attn(q, k, v, aidx, aidx, msk, cfg, axis)
            x = x + apply_linear(attn, lp["o_proj"])
            h2 = rms_norm(x, lp["post_attention_layernorm"],
                          cfg.rms_norm_eps)
            x = x + qwen_mlp(lp, h2)
            ks.append(k)
            vs.append(v)
            if i in want:
                kf = jax.lax.all_gather(k, axis, axis=1, tiled=True)
                mf = jax.lax.all_gather(msk, axis, axis=1, tiled=True)
                qlast = jax.lax.all_gather(
                    q[:, -1:], axis, axis=1, tiled=True)[:, -1]
                rows[i] = _last_row_probs(qlast, kf, mf, cfg)
        xl = rms_norm(x[:, -1:], pp["norm"], cfg.rms_norm_eps)[:, 0]
        logits_loc = lm_logits(xl, pp)
        me = jax.lax.axis_index(axis)
        sel = (me == jax.lax.psum(1, axis) - 1).astype(jnp.float32)
        logits = jax.lax.psum(logits_loc * sel, axis)
        kcat = jnp.stack(ks)
        vcat = jnp.stack(vs)
        if kv_quant:
            kq, ksc = quantize_kv(kcat)
            vq, vsc = quantize_kv(vcat)
            cache_out = (kq, ksc, vq, vsc)
        else:
            cache_out = (kcat, vcat)
        row_out = (jnp.stack([rows[i] for i in want])
                   if want else jnp.zeros((1,), jnp.float32))
        return logits, cache_out, row_out

    logits, cache_parts, rows = run(
        params, inputs_embeds, attention_mask, cos, sin, abs_idx)
    pad5 = ((0, 0), (0, 0), (0, max_seq - T), (0, 0), (0, 0))
    if kv_quant:
        pad4 = pad5[:-1]
        kq, ksc, vq, vsc = cache_parts
        cache = QuantKVCache(
            jnp.pad(kq, pad5), jnp.pad(ksc, pad4),
            jnp.pad(vq, pad5), jnp.pad(vsc, pad4))
    else:
        cache = (jnp.pad(cache_parts[0], pad5), jnp.pad(cache_parts[1], pad5))
    if not want:
        return logits, cache, None
    rows_d = {l: rows[j] for j, l in enumerate(want)}
    return logits, cache, _stack_rows(rows_d, extract_layer)


def sp_prefill(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,     # (B, T, D)
    attention_mask: jnp.ndarray,    # (B, T) bool
    mesh: Mesh,
    axis: str = "data",
    max_seq: Optional[int] = None,
    extract_layer=None,
    kv_quant: bool = False,
):
    """Sequence-parallel `llama_prefill`. T must divide the `axis` size.
    ``kv_quant=True`` returns a `QuantKVCache` (module docstring)."""
    B, T, D = inputs_embeds.shape
    n = mesh.shape[axis]
    if T % n:
        raise ValueError(f"prompt length {T} not divisible by {axis}={n}")
    max_seq = _check_max_seq(max_seq, T)
    want = extract_layers_tuple(extract_layer)

    # rope positions follow the HF left-pad convention (valid-token count),
    # computed globally and sliced INTO the shards with the embeds
    positions = jnp.clip(
        jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0, None)
    abs_idx = jnp.arange(T, dtype=jnp.int32)

    other = [a for a in mesh.axis_names if a != axis]
    rep = {a: None for a in other}  # params/outputs replicated on other axes

    def spec(*names):
        return P(*names)

    blk5 = spec(None, None, axis, None, None)   # (L, B, Tl, kvH, hd)
    blk4 = spec(None, None, axis, None)         # (L, B, Tl, kvH) scales
    cache_spec = ((blk5, blk4) * 2) if kv_quant else (blk5,) * 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), params),
            spec(None, axis, None),      # embeds: sequence-sharded
            spec(None, axis),            # mask
            spec(None, axis),            # positions
            spec(axis),                  # absolute indices
        ),
        out_specs=(
            spec(),                      # last logits
            cache_spec,                  # cache k, v (+ scales if quantized)
            spec(),                      # extract rows
        ),
        check_vma=False,
    )
    def run(pp, emb, msk, pos, aidx):
        cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
        x = emb
        ks, vs = [], []
        rows = {}
        n_loc = aidx.shape[0]
        for i, lp in enumerate(pp["layers"]):
            h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            q = apply_linear(h, lp["q_proj"]).reshape(
                B, n_loc, cfg.num_attention_heads, cfg.head_dim)
            k = apply_linear(h, lp["k_proj"]).reshape(
                B, n_loc, cfg.kv_heads, cfg.head_dim)
            v = apply_linear(h, lp["v_proj"]).reshape(
                B, n_loc, cfg.kv_heads, cfg.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            attn = _ring_attn(q, k, v, aidx, aidx, msk, cfg, axis)
            x = x + apply_linear(attn, lp["o_proj"])
            h2 = rms_norm(x, lp["post_attention_layernorm"],
                          cfg.rms_norm_eps)
            mlp = apply_linear(
                jax.nn.silu(apply_linear(h2, lp["gate_proj"]))
                * apply_linear(h2, lp["up_proj"]),
                lp["down_proj"],
            )
            x = x + mlp
            ks.append(k)
            vs.append(v)
            if i in want:
                # extract row: the LAST query's probs over the full history
                # — one all-gather of this layer's K (O(T), never (T, T))
                kf = jax.lax.all_gather(k, axis, axis=1, tiled=True)
                mf = jax.lax.all_gather(msk, axis, axis=1, tiled=True)
                # last query lives on the LAST shard; all shards compute it
                # from the gathered K so the row is replicated (psum-free)
                qlast = jax.lax.all_gather(
                    q[:, -1:], axis, axis=1, tiled=True)[:, -1]
                rows[i] = _last_row_probs(qlast, kf, mf, cfg)
        xl = rms_norm(x[:, -1:], pp["norm"], cfg.rms_norm_eps)[:, 0]
        logits_loc = lm_logits(xl, pp)
        # the prompt's last token lives on the last shard; select it
        me = jax.lax.axis_index(axis)
        sel = (me == jax.lax.psum(1, axis) - 1).astype(jnp.float32)
        logits = jax.lax.psum(logits_loc * sel, axis)
        kcat = jnp.stack(ks)           # (L, B, Tl, kvH, hd) — shard axis 2
        vcat = jnp.stack(vs)
        if kv_quant:
            kq, ksc = quantize_kv(kcat)
            vq, vsc = quantize_kv(vcat)
            cache_out = (kq, ksc, vq, vsc)
        else:
            cache_out = (kcat, vcat)
        row_out = (jnp.stack([rows[i] for i in want])
                   if want else jnp.zeros((1,), jnp.float32))
        return logits, cache_out, row_out

    logits, cache_parts, rows = run(
        params, inputs_embeds, attention_mask, positions, abs_idx)
    pad5 = ((0, 0), (0, 0), (0, max_seq - T), (0, 0), (0, 0))
    if kv_quant:
        pad4 = pad5[:-1]
        kq, ksc, vq, vsc = cache_parts
        cache = QuantKVCache(
            jnp.pad(kq, pad5), jnp.pad(ksc, pad4),
            jnp.pad(vq, pad5), jnp.pad(vsc, pad4))
    else:
        cache = LlamaKVCache(jnp.pad(cache_parts[0], pad5),
                             jnp.pad(cache_parts[1], pad5))
    if not want:
        return logits, cache, None
    rows_d = {l: rows[j] for j, l in enumerate(want)}
    return logits, cache, _stack_rows(rows_d, extract_layer)

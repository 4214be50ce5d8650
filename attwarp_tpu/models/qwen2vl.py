"""Qwen2-VL in functional JAX.

Second MLLM family. The reference's training artifacts were produced with a
Qwen pipeline (its dataset roots are ``*_qwen_multilayer`` — SURVEY C25/C18),
so attention extraction against Qwen2-VL class models belongs in the
framework alongside LLaVA. Architecture parity with HuggingFace
``Qwen2VLForConditionalGeneration``:

- **Vision**: 3D-conv patch embed (temporal 2 × 14 × 14, images duplicated
  across the temporal pair by the processor), 2-D rotary position embeddings
  over (h, w) patch coordinates in spatial-merge order, pre-LN blocks with
  QuickGELU MLPs and full (non-causal) attention, and a 2×2 PatchMerger
  (LayerNorm → MLP) into the text width.
- **Text**: Qwen2 decoder (LLaMA-like with q/k/v biases) with **M-RoPE**:
  3-D (t, h, w) position streams whose cos/sin are interleaved per
  ``mrope_section`` channel groups; text tokens share one stream so they
  reduce to ordinary RoPE.

Single-image focus (the warp pipeline's use case): ``get_mrope_positions``
replicates HF's ``get_rope_index`` for one image per sample with left
padding; videos are out of scope.

Weight porting is 1:1 from the HF state dict; numerics verified against
transformers at tiny scale in ``tests/test_qwen2vl_parity.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.extract.accumulator import accumulate_step, finalize, init_carry
from attwarp_tpu.models.llama import (
    QuantKVCache,
    _attn_quantcache,
    _flash_attn,
    _last_row_probs,
    _repeat_kv,
    _stack_rows,
    extract_layers_tuple,
    flash_prefill_supported,
    rms_norm,
)
from attwarp_tpu.numerics.quant import apply_linear, lm_logits, quantize_kv
from attwarp_tpu.ops.pallas_decode_attn import (
    decode_attn_bias,
    decode_attn_quantcache,
    decode_attn_supported,
    prepare_decode_attn_operands,
)


# ── configs ─────────────────────────────────────────────────────────────


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 3584          # text width the merger projects into
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    mlp_ratio: int = 4
    hidden_act: str = "quick_gelu"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclass(frozen=True)
class Qwen2VLTextConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    mrope_section: Tuple[int, ...] = (16, 24, 24)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads


@dataclass(frozen=True)
class Qwen2VLConfig:
    vision: Qwen2VLVisionConfig = field(default_factory=Qwen2VLVisionConfig)
    text: Qwen2VLTextConfig = field(default_factory=Qwen2VLTextConfig)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    pad_token_id: int = 151643
    eos_token_id: int = 151645


# ── image patchification (HF Qwen2VLImageProcessor layout) ──────────────


def patchify_image(image: np.ndarray, cfg: Qwen2VLVisionConfig) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """(H, W, 3) float (H, W divisible by patch*merge) -> (num_patches,
    C*T*P*P) in HF's spatial-merge-ordered flattened layout + grid (t, h, w).
    """
    P, M, T = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
    H, W = image.shape[:2]
    gh, gw = H // P, W // P
    assert gh % M == 0 and gw % M == 0, (H, W)
    x = np.asarray(image, np.float32).transpose(2, 0, 1)          # (C, H, W)
    x = np.broadcast_to(x[None], (T, *x.shape))                   # (T, C, H, W)
    x = x.reshape(1, T, cfg.in_channels, gh // M, M, P, gw // M, M, P)
    # -> (grid_t, gh_block, gw_block, merge_h, merge_w, C, T, P, P)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = x.reshape(gh * gw, cfg.in_channels * T * P * P)
    return np.ascontiguousarray(flat), (1, gh, gw)


# ── vision tower ────────────────────────────────────────────────────────


def _vision_rot_pos(grid_hw: Tuple[int, int], cfg: Qwen2VLVisionConfig) -> np.ndarray:
    """(num_patches, head_dim/2) rotary frequencies over merge-ordered (h, w)."""
    gh, gw = grid_hw
    M = cfg.spatial_merge_size
    h = np.arange(gh)[:, None].repeat(gw, 1)
    w = np.arange(gw)[None, :].repeat(gh, 0)

    def merge_order(a):
        return (
            a.reshape(gh // M, M, gw // M, M).transpose(0, 2, 1, 3).reshape(-1)
        )

    hpos, wpos = merge_order(h), merge_order(w)
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    fh = hpos[:, None] * inv_freq[None, :]
    fw = wpos[:, None] * inv_freq[None, :]
    return np.concatenate([fh, fw], axis=-1).astype(np.float32)  # (N, hd/2)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def qwen2vl_vision_features(
    params: Dict[str, Any],
    cfg: Qwen2VLVisionConfig,
    patches: jnp.ndarray,          # (N, C*T*P*P) HF-patchified
    grid_hw: Tuple[int, int],      # static (gh, gw)
) -> jnp.ndarray:
    """Vision tower -> merged features (N / merge², hidden_size)."""
    x = patches.astype(jnp.float32) @ params["patch_weight"].T  # (N, embed)
    freqs = jnp.asarray(_vision_rot_pos(grid_hw, cfg))          # (N, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)              # (N, hd)
    cos = jnp.cos(emb)[:, None, :]
    sin = jnp.sin(emb)[:, None, :]

    H = cfg.num_heads
    hd = cfg.head_dim
    scale = 1.0 / np.sqrt(hd)
    for blk in params["blocks"]:
        h = _ln(x, blk["norm1"])
        qkv = h @ blk["qkv"]["weight"].T + blk["qkv"]["bias"]
        q, k, v = jnp.split(qkv.reshape(x.shape[0], 3, H, hd), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]                    # (N, H, hd)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        logits = jnp.einsum("qhd,khd->hqk", q, k) * scale
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs.astype(v.dtype), v)
        attn = attn.reshape(x.shape[0], cfg.embed_dim)
        x = x + attn @ blk["proj"]["weight"].T + blk["proj"]["bias"]
        h2 = _ln(x, blk["norm2"])
        m = h2 @ blk["fc1"]["weight"].T + blk["fc1"]["bias"]
        m = m * jax.nn.sigmoid(1.702 * m) if cfg.hidden_act == "quick_gelu" else jax.nn.gelu(m)
        x = x + m @ blk["fc2"]["weight"].T + blk["fc2"]["bias"]

    # PatchMerger: LN per patch, group merge² consecutive patches, MLP
    mg = params["merger"]
    y = _ln(x, mg["ln_q"])
    y = y.reshape(-1, cfg.embed_dim * cfg.spatial_merge_size**2)
    y = y @ mg["fc1"]["weight"].T + mg["fc1"]["bias"]
    y = jax.nn.gelu(y, approximate=False)
    return y @ mg["fc2"]["weight"].T + mg["fc2"]["bias"]       # (N/4, hidden)


def _ln(x, p, eps: float = 1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


# ── M-RoPE ──────────────────────────────────────────────────────────────


def get_mrope_positions(
    input_ids: np.ndarray,          # (B, T) with expanded image tokens
    attention_mask: np.ndarray,     # (B, T)
    grid_thw: Tuple[int, int, int],
    image_token_id: int,
    spatial_merge_size: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """HF ``get_rope_index`` for one image per sample (or pure text):
    returns (position_ids (3, B, T), rope_deltas (B,))."""
    B, T = input_ids.shape
    t, h, w = grid_thw
    gh, gw = h // spatial_merge_size, w // spatial_merge_size
    pos = np.ones((3, B, T), np.int64)
    deltas = np.zeros((B,), np.int64)
    for b in range(B):
        valid = attention_mask[b] == 1
        ids = input_ids[b][valid]
        parts: List[np.ndarray] = []
        img_idx = np.nonzero(ids == image_token_id)[0]
        if img_idx.size:
            ed = int(img_idx[0])
            parts.append(np.tile(np.arange(ed), (3, 1)))
            st_idx = ed
            t_i = np.repeat(np.arange(t), gh * gw)
            h_i = np.tile(np.repeat(np.arange(gh), gw), t)
            w_i = np.tile(np.arange(gw), t * gh)
            parts.append(np.stack([t_i, h_i, w_i]) + st_idx)
            st = ed + t * gh * gw
            if st < len(ids):
                st_idx = parts[-1].max() + 1
                parts.append(np.tile(np.arange(len(ids) - st), (3, 1)) + st_idx)
            llm = np.concatenate(parts, axis=1)
        else:
            llm = np.tile(np.arange(len(ids)), (3, 1))
        pos[:, b, valid] = llm
        deltas[b] = llm.max() + 1 - T
    return pos, deltas


def mrope_cos_sin(
    positions: jnp.ndarray,         # (3, B, T)
    cfg: Qwen2VLTextConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-stream positions -> effective (cos, sin) of shape (B, T, head_dim)
    with channels interleaved per mrope_section (HF
    apply_multimodal_rotary_pos_emb semantics)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float32) / hd)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (3, B, T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)               # (3, B, T, hd)
    cos3, sin3 = jnp.cos(emb), jnp.sin(emb)
    sections = list(cfg.mrope_section) * 2
    out_c, out_s = [], []
    offset = 0
    for i, sec in enumerate(sections):
        out_c.append(cos3[i % 3, :, :, offset : offset + sec])
        out_s.append(sin3[i % 3, :, :, offset : offset + sec])
        offset += sec
    return jnp.concatenate(out_c, axis=-1), jnp.concatenate(out_s, axis=-1)


def _apply_rope(q, k, cos, sin):
    """q, k: (B, T, H, hd); cos, sin: (B, T, hd)."""
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


# ── text decoder ────────────────────────────────────────────────────────


def _attn(q, k, v, mask, cfg: Qwen2VLTextConfig, want_probs: bool):
    n_rep = cfg.num_attention_heads // cfg.kv_heads
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    scale = 1.0 / np.sqrt(cfg.head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    logits = jnp.where(mask[:, None, :, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    B, Tq = out.shape[0], out.shape[1]
    return out.reshape(B, Tq, cfg.hidden_size), (
        probs[:, :, -1, :] if want_probs else None
    )


def _qkv(lp, cfg: Qwen2VLTextConfig, h):
    B, T, _ = h.shape
    q = apply_linear(h, lp["q_proj"]).reshape(
        B, T, cfg.num_attention_heads, cfg.head_dim
    )
    k = apply_linear(h, lp["k_proj"]).reshape(B, T, cfg.kv_heads, cfg.head_dim)
    v = apply_linear(h, lp["v_proj"]).reshape(B, T, cfg.kv_heads, cfg.head_dim)
    return q, k, v


def _mlp(lp, h2):
    return apply_linear(
        jax.nn.silu(apply_linear(h2, lp["gate_proj"])) * apply_linear(h2, lp["up_proj"]),
        lp["down_proj"],
    )


def qwen2vl_prefill(
    params, cfg: Qwen2VLTextConfig, inputs_embeds, attention_mask, cos, sin,
    max_seq: int, extract_layer: Optional[int] = None, kv_quant: bool = False,
    use_flash: bool = False,
):
    """Returns (last logits, kv cache (k, v stacked), extract row).

    ``kv_quant`` stores the cache int8 (``QuantKVCache``); the prefill's own
    attention still uses exact keys/values, so logits and the extract row
    are identical — only decode steps read quantized history.

    ``use_flash`` routes attention through the same Pallas flash kernel as
    the LLaVA prefill (``models/llama.py::_flash_attn``): M-RoPE only
    changes the cos/sin applied to q/k BEFORE attention, so the kernel and
    its left-padding segment-id encoding are shared verbatim; the extract
    layer's last-row probabilities come from the O(T) ``_last_row_probs``
    pass, so no (T, T) matrix is materialized. Prompts under 256 tokens
    fall back to dense (``flash_prefill_supported``)."""
    B, T, _ = inputs_embeds.shape
    causal = jnp.tril(jnp.ones((T, T), bool))[None]
    mask = jnp.logical_and(causal, attention_mask[:, None, :])
    flash = use_flash and flash_prefill_supported(T)
    x = inputs_embeds
    want = extract_layers_tuple(extract_layer)
    ks, vs, rows = [], [], {}
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, cfg, h)
        q, k = _apply_rope(q, k, cos, sin)
        if flash:
            attn = _flash_attn(q, k, v, attention_mask, cfg)
            r = (_last_row_probs(q[:, -1], k, mask[:, -1, :], cfg)
                 if i in want else None)
        else:
            attn, r = _attn(q, k, v, mask, cfg, want_probs=(i in want))
        if r is not None:
            rows[i] = r
        x = x + apply_linear(attn, lp["o_proj"])
        h2 = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(lp, h2)
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
        cache = (jnp.stack(ks), jnp.stack(vs))
    return logits, cache, _stack_rows(rows, extract_layer)


def qwen2vl_decode_step(
    params, cfg: Qwen2VLTextConfig, token_embeds, kv, cur_len, cos, sin,
    kv_mask, extract_layer: Optional[int] = None, prep=None,
):
    """``prep`` (from ``llama.make_decode_prep``): carried flash-decoding
    scale operands for multi-step chains; when passed, the step returns it
    appended as a fourth element (see llama.py::llama_decode_step)."""
    B = token_embeds.shape[0]
    x = token_embeds
    quant = isinstance(kv, QuantKVCache)
    want = extract_layers_tuple(extract_layer)

    def upd(cache, new, layer):
        # in-place-aliasable write of (B, 1, ...) at [layer, :, cur_len]
        # (see llama.py::llama_decode_step — no full-cache stack/rewrite)
        zeros = (0,) * (cache.ndim - 3)
        return jax.lax.dynamic_update_slice(
            cache, new[None], (layer, 0, cur_len, *zeros)
        )

    # form ladder mirrors llama_decode_step (B static at trace time):
    # supported shapes take the Pallas flash-decoding kernel at ANY batch
    # (the v2 kernel's bandwidth scales monotonically with B) — stale
    # step-entry reads, current token merged outside, ONE batched append
    # at the end (GQA n_rep=7 at the real 7B geometry is just the kernel's
    # head-group selection mask); unsupported shapes fall back to the
    # scale-factored XLA form at B>=16, fused dequant below that.
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
            zeros = (0,) * (cache.ndim - 2)
            return jax.lax.dynamic_update_slice(
                cache, new, (0, cur_len, *zeros))

    rows = {}
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        q, k1, v1 = _qkv(lp, cfg, h)
        q, k1 = _apply_rope(q, k1, cos, sin)
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
            kcache, vcache = kv
            kv = (upd(kcache, k1, i), upd(vcache, v1, i))
            attn, r = _attn(q, kv[0][i], kv[1][i], kv_mask[:, None, :], cfg,
                            want_probs=(i in want))
        if r is not None:
            rows[i] = r
        x = x + apply_linear(attn, lp["o_proj"])
        h2 = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(lp, h2)
    if quant and use_kernel:
        from attwarp_tpu.models.llama import append_decode_quant

        kv, prep = append_decode_quant(
            kv0, appends, cur_len, cfg.kv_heads, prep)
    elif prep is not None:
        from attwarp_tpu.models.llama import make_decode_prep

        prep = make_decode_prep(kv)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = lm_logits(x[:, 0], params)
    row = _stack_rows(rows, extract_layer)
    if prep is not None:
        return logits, kv, row, prep
    return logits, kv, row


# ── combined model ──────────────────────────────────────────────────────


def embed_and_splice(params, cfg: Qwen2VLConfig, input_ids, image_features):
    """Replace image-token embeddings with vision features in order.
    image_features: (N_img_tokens, D) for one image shared across the batch,
    or (B, N_img_tokens, D) for per-sample images (same token count)."""
    ids = jnp.asarray(input_ids)
    emb = params["text"]["embed_tokens"][jnp.clip(ids, 0, None)]
    is_img = ids == cfg.image_token_id
    order = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1, 0,
                     image_features.shape[-2] - 1)
    if image_features.ndim == 2:
        img_at = image_features[order]
    else:
        img_at = jnp.take_along_axis(image_features, order[..., None], axis=1)
    return jnp.where(is_img[..., None], img_at, emb)


class Qwen2VLModel:
    def __init__(self, cfg: Qwen2VLConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.params = params

    def forward_logits(
        self, input_ids, patches, grid_thw, attention_mask=None,
        extract_layer: Optional[int] = None,
    ):
        B, T = np.asarray(input_ids).shape
        if attention_mask is None:
            attention_mask = np.ones((B, T), np.int64)
        feats = qwen2vl_vision_features(
            self.params["vision"], self.cfg.vision, jnp.asarray(patches),
            (grid_thw[1], grid_thw[2]),
        )
        embeds = embed_and_splice(self.params, self.cfg, input_ids, feats)
        pos, _ = get_mrope_positions(
            np.asarray(input_ids), np.asarray(attention_mask), grid_thw,
            self.cfg.image_token_id, self.cfg.vision.spatial_merge_size,
        )
        cos, sin = mrope_cos_sin(jnp.asarray(pos), self.cfg.text)
        logits, _kv, row = qwen2vl_prefill(
            self.params["text"], self.cfg.text, embeds,
            jnp.asarray(attention_mask, bool), cos, sin, max_seq=T,
            extract_layer=extract_layer,
        )
        return logits, row

    def generate_with_attention(
        self, input_ids, patches, grid_thw, attention_mask,
        extract_layer: int, max_new_tokens: int = 20, kv_quant: bool = False,
        use_flash: bool = False,
    ):
        """Greedy decode with scan-carried attention accumulation; returns
        (generated ids (B, K), attention maps (B, gh/M, gw/M)).

        ``patches``: (N, D) for one image shared across the batch, or
        (B, N, D) for per-sample images (same grid). ``extract_layer`` may
        be an int or a sequence of ints; a sequence extracts every listed
        layer in the same pass -> maps (L, B, gh/M, gw/M); ``None`` is the
        answer-only fast path (no attention materialized, maps is None).
        ``kv_quant`` stores the KV cache int8 (numerics/quant.py)."""
        if extract_layer is not None and not isinstance(extract_layer, int):
            extract_layer = tuple(extract_layer)
        ids = np.asarray(input_ids)
        mask_np = np.asarray(attention_mask)
        B, T = ids.shape
        pos, deltas = get_mrope_positions(
            ids, mask_np, grid_thw, self.cfg.image_token_id,
            self.cfg.vision.spatial_merge_size,
        )
        img_start = np.argmax(ids == self.cfg.image_token_id, axis=1).astype(np.int32)
        M = self.cfg.vision.spatial_merge_size
        side_h = grid_thw[1] // M
        side_w = grid_thw[2] // M
        return _qwen_generate_jit(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(patches),
            jnp.asarray(mask_np, bool), jnp.asarray(pos), jnp.asarray(deltas),
            jnp.asarray(img_start), grid_thw, extract_layer, max_new_tokens,
            side_h, side_w, kv_quant, use_flash,
        )


@partial(
    jax.jit,
    static_argnames=("cfg", "grid_thw", "extract_layer", "max_new_tokens",
                     "side_h", "side_w", "kv_quant", "use_flash"),
)
def _qwen_generate_jit(
    params, cfg: Qwen2VLConfig, input_ids, patches, attention_mask,
    positions, deltas, img_start, grid_thw, extract_layer: int,
    max_new_tokens: int, side_h: int, side_w: int, kv_quant: bool = False,
    use_flash: bool = False,
):
    tcfg = cfg.text
    B, T = input_ids.shape
    max_seq = T + max_new_tokens
    if kv_quant:
        # 64-multiple cache so the Pallas flash-decoding kernel's seq-tile
        # gate holds (mirrors _llava_generate; extra slots stay masked)
        max_seq = -(-max_seq // 64) * 64
    n_img = side_h * side_w
    answer_only = extract_layer is None
    multi = not answer_only and not isinstance(extract_layer, int)

    def acc(carry, row):
        if answer_only:  # no accumulator carried at all
            return carry
        if multi:  # row (L, B, H, T): one accumulator per extracted layer
            return jax.vmap(
                lambda c, r: accumulate_step(c, r, img_start, jnp.ones((B,)), n_img)
            )(carry, row)
        return accumulate_step(carry, row, img_start, jnp.ones((B,)), n_img)

    def carry_init():
        if answer_only:
            return None
        c = init_carry(B, n_img)
        if multi:
            L = len(extract_layer)
            c = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (L, *x.shape)), c
            )
        return c

    if patches.ndim == 3:
        # per-sample images: (B, N, C*T*P*P) -> vmap the vision tower
        feats = jax.vmap(
            lambda p: qwen2vl_vision_features(
                params["vision"], cfg.vision, p, (grid_thw[1], grid_thw[2])
            )
        )(patches)
    else:
        feats = qwen2vl_vision_features(
            params["vision"], cfg.vision, patches, (grid_thw[1], grid_thw[2])
        )
    embeds = embed_and_splice(params, cfg, input_ids, feats)
    cos, sin = mrope_cos_sin(positions, tcfg)
    logits, kv, row0 = qwen2vl_prefill(
        params["text"], tcfg, embeds, attention_mask, cos, sin,
        max_seq=max_seq, extract_layer=extract_layer, kv_quant=kv_quant,
        use_flash=use_flash,
    )
    carry0 = acc(carry_init(), row0)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    finished0 = tok0 == cfg.eos_token_id
    full_mask = jnp.pad(attention_mask, ((0, 0), (0, max_seq - T)))

    def body(state, step):
        tok, kv, prep, finished, carry, full_mask = state
        cur_len = T + step
        full_mask = full_mask.at[:, cur_len].set(True)
        # all three mrope streams share the text position after the prompt
        p = (T + deltas + step).astype(jnp.int32)           # (B,)
        pos3 = jnp.broadcast_to(p[None, :, None], (3, B, 1))
        cos1, sin1 = mrope_cos_sin(pos3, tcfg)
        emb = params["text"]["embed_tokens"][tok][:, None, :]
        if prep is None:
            logits, kv, row = qwen2vl_decode_step(
                params["text"], tcfg, emb, kv, cur_len, cos1, sin1,
                full_mask, extract_layer=extract_layer,
            )
        else:
            logits, kv, row, prep = qwen2vl_decode_step(
                params["text"], tcfg, emb, kv, cur_len, cos1, sin1,
                full_mask, extract_layer=extract_layer, prep=prep,
            )
        carry = acc(carry, row)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # finished sequences continue with the PAD token, matching HF
        # generate (it forces pad_token_id for finished rows)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        finished = jnp.logical_or(finished, nxt == cfg.eos_token_id)
        return (nxt, kv, prep, finished, carry, full_mask), tok

    # unroll amortizes the while-loop carry-boundary cache copies the
    # flash-decoding kernel's reads provoke (see _llava_generate's note);
    # the carried prep pays the kernel's scale relayout once per chain
    from attwarp_tpu.models.llama import make_decode_prep

    unroll = min(8, max_new_tokens) if kv_quant else 1
    (_, _, _, _, carry, _), toks = jax.lax.scan(
        body, (tok0, kv, make_decode_prep(kv), finished0, carry0, full_mask),
        jnp.arange(max_new_tokens, dtype=jnp.int32),
        unroll=unroll,
    )
    if answer_only:
        maps = None
    elif multi:
        maps = jax.vmap(lambda c: finalize(c, side_h, side_w))(carry)
    else:
        maps = finalize(carry, side_h, side_w)
    return jnp.moveaxis(toks, 0, 1), maps


# ── HF weight porting ───────────────────────────────────────────────────


def _np_(t) -> np.ndarray:
    try:
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, np.float32)


def port_hf_qwen2vl_weights(
    state_dict: Dict[str, Any], cfg: Qwen2VLConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """Port an HF ``Qwen2VLForConditionalGeneration`` state dict (handles
    both the pre-4.52 ``visual.* / model.*`` and the post ``model.visual.* /
    model.language_model.*`` layouts)."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model.visual."):
            k = "visual." + k[len("model.visual."):]
        elif k.startswith("model.language_model."):
            k = "model." + k[len("model.language_model."):]
        sd[k] = v

    def g(key):
        return _np_(sd[key])

    def wb(prefix):
        return {"weight": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    v = cfg.vision
    pw = g("visual.patch_embed.proj.weight")  # (embed, C, T, P, P)
    vision = {
        "patch_weight": pw.reshape(pw.shape[0], -1),
        "blocks": [
            {
                "norm1": wb(f"visual.blocks.{i}.norm1"),
                "norm2": wb(f"visual.blocks.{i}.norm2"),
                "qkv": wb(f"visual.blocks.{i}.attn.qkv"),
                "proj": wb(f"visual.blocks.{i}.attn.proj"),
                "fc1": wb(f"visual.blocks.{i}.mlp.fc1"),
                "fc2": wb(f"visual.blocks.{i}.mlp.fc2"),
            }
            for i in range(v.depth)
        ],
        "merger": {
            "ln_q": wb("visual.merger.ln_q"),
            "fc1": wb("visual.merger.mlp.0"),
            "fc2": wb("visual.merger.mlp.2"),
        },
    }

    t = cfg.text
    text = {
        "embed_tokens": g("model.embed_tokens.weight"),
        "norm": g("model.norm.weight"),
        "layers": [
            {
                "input_layernorm": g(f"model.layers.{i}.input_layernorm.weight"),
                "post_attention_layernorm": g(
                    f"model.layers.{i}.post_attention_layernorm.weight"
                ),
                "q_proj": wb(f"model.layers.{i}.self_attn.q_proj"),
                "k_proj": wb(f"model.layers.{i}.self_attn.k_proj"),
                "v_proj": wb(f"model.layers.{i}.self_attn.v_proj"),
                "o_proj": g(f"model.layers.{i}.self_attn.o_proj.weight"),
                "gate_proj": g(f"model.layers.{i}.mlp.gate_proj.weight"),
                "up_proj": g(f"model.layers.{i}.mlp.up_proj.weight"),
                "down_proj": g(f"model.layers.{i}.mlp.down_proj.weight"),
            }
            for i in range(t.num_hidden_layers)
        ],
    }
    if "lm_head.weight" in sd:
        text["lm_head"] = g("lm_head.weight")

    to_jnp = lambda tree: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype=dtype), tree
    )
    return {"vision": to_jnp(vision), "text": to_jnp(text)}

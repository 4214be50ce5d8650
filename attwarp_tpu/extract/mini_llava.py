"""MiniLLaVA: a small, fully-functional JAX multimodal decoder used as the
test backend for attention extraction (SURVEY §4 item 4 — the reference has
nothing like this; it always loads the real 7B model).

Structurally mirrors LLaVA-1.5's interface at 1/1000 scale: an image is
patchified into ``num_patches²`` visual tokens spliced into the token-embedding
sequence at the image-placeholder position; a causal decoder generates
greedily; the ``extract_layer``'s post-softmax attention row of the current
token is RETURNED by the forward pass and accumulated in the scan carry —
the hook-free equivalent of ``MaskHookLogger`` (llava.py:37-153) and of the
"patch only the target layer" trick (llava.py:422-438): every other layer's
attention is never materialized.

Everything under ``decode`` is one ``lax.scan`` — static shapes, KV cache,
per-sample finished flags; batched left-padding offsets are handled by the
same arithmetic as the reference (see attwarp_tpu.extract.offsets).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.extract.accumulator import (
    accumulate_step,
    finalize,
    init_carry,
)
from attwarp_tpu.extract.offsets import IMAGE_TOKEN_INDEX


@dataclass(frozen=True)
class MiniLLaVAConfig:
    vocab: int = 4096
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 4
    extract_layer: int = 2
    num_patches: int = 24          # 24x24 = 576 image tokens
    image_size: int = 336
    max_seq: int = 704             # >= 576 + prompt + new tokens
    pad_id: int = 0
    bos_id: int = 1
    eos_id: int = 2

    @property
    def num_image_tokens(self) -> int:
        return self.num_patches * self.num_patches

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def patch_size(self) -> int:
        return self.image_size // self.num_patches


class HashTokenizer:
    """Deterministic word-level tokenizer for the test backend. Stable ids
    via blake2; remembers id->word for decoding."""

    def __init__(self, cfg: MiniLLaVAConfig):
        self.cfg = cfg
        self._id_to_word: Dict[int, str] = {}

    def encode_word(self, w: str) -> int:
        h = int.from_bytes(hashlib.blake2s(w.encode()).digest()[:4], "little")
        tid = 10 + h % (self.cfg.vocab - 10)
        self._id_to_word.setdefault(tid, w)
        return tid

    def encode(self, text: str, image_token: str = "<image>") -> List[int]:
        """BOS + word ids, with the image token mapped to IMAGE_TOKEN_INDEX."""
        ids = [self.cfg.bos_id]
        for w in text.replace(image_token, f" {image_token} ").split():
            ids.append(IMAGE_TOKEN_INDEX if w == image_token else self.encode_word(w))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        words = []
        for t in ids:
            t = int(t)
            if t in (self.cfg.pad_id, self.cfg.bos_id, self.cfg.eos_id):
                continue
            words.append(self._id_to_word.get(t, f"<{t}>"))
        return " ".join(words)


def init_params(cfg: MiniLLaVAConfig, key: jax.Array):
    """Parameter pytree for the mini model."""
    ks = jax.random.split(key, 8 + 8 * cfg.n_layers)
    d, hd = cfg.d_model, cfg.head_dim
    s = 0.02
    params = {
        "tok_emb": jax.random.normal(ks[0], (cfg.vocab, d)) * s,
        "pos_emb": jax.random.normal(ks[1], (cfg.max_seq, d)) * s,
        "patch_proj": jax.random.normal(ks[2], (cfg.patch_size * cfg.patch_size * 3, d)) * s,
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "lm_head": jax.random.normal(ks[3], (d, cfg.vocab)) * s,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        k = ks[8 + 8 * i : 8 + 8 * (i + 1)]
        params["layers"].append(
            {
                "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                "wq": jax.random.normal(k[0], (d, d)) * s,
                "wk": jax.random.normal(k[1], (d, d)) * s,
                "wv": jax.random.normal(k[2], (d, d)) * s,
                "wo": jax.random.normal(k[3], (d, d)) * s,
                "w1": jax.random.normal(k[4], (d, 4 * d)) * s,
                "w2": jax.random.normal(k[5], (4 * d, d)) * s,
            }
        )
    return params


def _ln(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def encode_image(params, cfg: MiniLLaVAConfig, image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) -> (num_image_tokens, d_model) patch embeddings."""
    P, n = cfg.patch_size, cfg.num_patches
    img = image.astype(jnp.float32)
    x = img.reshape(n, P, n, P, 3).transpose(0, 2, 1, 3, 4).reshape(n * n, P * P * 3)
    return x @ params["patch_proj"]


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, max_seq, H, hd)
    v: jnp.ndarray


def _attention(q, k, v, mask, cfg):
    """q: (B, Tq, H, hd); k, v: (B, Tk, H, hd); mask: (B, Tq, Tk) bool.
    Returns (out (B, Tq, D), probs (B, H, Tq, Tk))."""
    scale = 1.0 / np.sqrt(cfg.head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = jnp.where(mask[:, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    B, Tq = out.shape[0], out.shape[1]
    return out.reshape(B, Tq, cfg.d_model), probs


def _layer_fwd(lp, cfg, x, pos_mask, k_cache=None, v_cache=None, want_probs=False):
    """One decoder layer over a full sequence (prefill). Returns
    (y, k, v, probs_last_row or None)."""
    B, T, D = x.shape
    h = _ln(x, lp["ln1"])
    q = (h @ lp["wq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
    k = (h @ lp["wk"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
    v = (h @ lp["wv"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
    causal = jnp.tril(jnp.ones((T, T), bool))[None]
    mask = jnp.logical_and(causal, pos_mask[:, None, :])
    attn, probs = _attention(q, k, v, mask, cfg)
    x = x + attn @ lp["wo"]
    h2 = _ln(x, lp["ln2"])
    x = x + jax.nn.gelu(h2 @ lp["w1"]) @ lp["w2"]
    row = probs[:, :, -1, :] if want_probs else None
    return x, k, v, row


def prefill(params, cfg: MiniLLaVAConfig, embeds, pos_mask):
    """Run the full prompt. embeds: (B, T, D); pos_mask: (B, T) valid tokens.

    Returns (logits_last (B, vocab), kv: KVCache padded to max_seq,
    extract_row (B, H, T))."""
    B, T, D = embeds.shape
    x = embeds + params["pos_emb"][None, :T]
    ks, vs, row = [], [], None
    for i, lp in enumerate(params["layers"]):
        x, k, v, r = _layer_fwd(lp, cfg, x, pos_mask, want_probs=(i == cfg.extract_layer))
        if r is not None:
            row = r
        pad = cfg.max_seq - T
        ks.append(jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))))
        vs.append(jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))))
    x = _ln(x, params["ln_f"])
    logits = x[:, -1] @ params["lm_head"]
    return logits, KVCache(jnp.stack(ks), jnp.stack(vs)), row


def decode_step(params, cfg: MiniLLaVAConfig, token, kv: KVCache, cur_len, pos_mask):
    """One greedy step. token: (B,) int32; cur_len: scalar current sequence
    length (same for the whole left-padded batch); pos_mask: (B, max_seq).

    Returns (logits, new_kv, extract_row (B, H, max_seq))."""
    B = token.shape[0]
    x = params["tok_emb"][token][:, None, :] + params["pos_emb"][cur_len][None, None, :]
    row = None
    new_ks, new_vs = [], []
    kv_pos = jnp.arange(cfg.max_seq)[None, :]  # (1, max_seq)
    for i, lp in enumerate(params["layers"]):
        h = _ln(x, lp["ln1"])
        q = (h @ lp["wq"]).reshape(B, 1, cfg.n_heads, cfg.head_dim)
        k1 = (h @ lp["wk"]).reshape(B, 1, cfg.n_heads, cfg.head_dim)
        v1 = (h @ lp["wv"]).reshape(B, 1, cfg.n_heads, cfg.head_dim)
        k = jax.lax.dynamic_update_slice_in_dim(kv.k[i], k1, cur_len, axis=1)
        v = jax.lax.dynamic_update_slice_in_dim(kv.v[i], v1, cur_len, axis=1)
        new_ks.append(k)
        new_vs.append(v)
        mask = jnp.logical_and(kv_pos <= cur_len, pos_mask)[:, None, :]  # (B,1,max)
        attn, probs = _attention(q, k, v, mask, cfg)
        x = x + attn @ lp["wo"]
        h2 = _ln(x, lp["ln2"])
        x = x + jax.nn.gelu(h2 @ lp["w1"]) @ lp["w2"]
        if i == cfg.extract_layer:
            row = probs[:, :, 0, :]
    xf = _ln(x, params["ln_f"])
    logits = xf[:, 0] @ params["lm_head"]
    return logits, KVCache(jnp.stack(new_ks), jnp.stack(new_vs)), row


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def generate_with_attention(
    params,
    cfg: MiniLLaVAConfig,
    embeds: jnp.ndarray,      # (B, T, D) spliced prompt embeddings
    pos_mask: jnp.ndarray,    # (B, T) bool, False on left padding
    img_start: jnp.ndarray,   # (B,) int32 image-token start positions
    max_new_tokens: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode; returns (generated_ids (B, max_new_tokens),
    attention maps (B, 24, 24)).

    The attention accumulation replicates the reference's hook cadence: the
    prefill contributes the last prompt position's row, then every decode
    step of an unfinished sample contributes its row (llava.py:109-116).
    """
    B, T, _ = embeds.shape
    logits, kv, row0 = prefill(params, cfg, embeds, pos_mask)
    carry0 = accumulate_step(
        init_carry(B, cfg.num_image_tokens),
        row0,
        img_start,
        jnp.ones((B,)),
        cfg.num_image_tokens,
    )
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    finished0 = tok0 == cfg.eos_id
    full_mask = jnp.pad(pos_mask, ((0, 0), (0, cfg.max_seq - T)))

    def body(state, step):
        tok, kv, finished, attn_carry, full_mask = state
        cur_len = T + step
        full_mask = full_mask.at[:, cur_len].set(True)
        logits, kv, row = decode_step(params, cfg, tok, kv, cur_len, full_mask)
        # reference parity: the batched hook accumulates every step, incl.
        # rows after a sample finished (llava.py:384-411)
        attn_carry = accumulate_step(
            attn_carry, row, img_start, jnp.ones((tok.shape[0],)),
            cfg.num_image_tokens,
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, cfg.eos_id, nxt)
        finished = jnp.logical_or(finished, nxt == cfg.eos_id)
        return (nxt, kv, finished, attn_carry, full_mask), tok

    (_, _, _, carry, _), toks = jax.lax.scan(
        body,
        (tok0, kv, finished0, carry0, full_mask),
        jnp.arange(max_new_tokens, dtype=jnp.int32),
    )
    gen = jnp.moveaxis(toks, 0, 1)  # (B, max_new_tokens)
    return gen, finalize(carry, cfg.num_patches)


def build_spliced_embeds(
    params,
    cfg: MiniLLaVAConfig,
    padded_ids: np.ndarray,   # (B, L) with IMAGE_TOKEN_INDEX placeholders
    images: jnp.ndarray,      # (B, H, W, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand image placeholders into patch embeddings; returns
    (embeds (B, L_exp, D), pos_mask (B, L_exp), img_start (B,)).

    The splice map is computed host-side (static per batch), mirroring
    the reference's prepare_inputs_labels_for_multimodal + re-left-padding.
    """
    B, L = padded_ids.shape
    n_img = cfg.num_image_tokens
    unpadded = (padded_ids != cfg.pad_id).sum(axis=1)
    exp_lens = unpadded - 1 + n_img
    from attwarp_tpu.extract.offsets import bucket_length

    # bucket the post-expansion length so one compilation serves all
    # batches whose expanded prompts fall in the same bucket
    L_exp = bucket_length(int(exp_lens.max()), bucket=8)

    is_img = np.zeros((B, L_exp), np.bool_)
    src_idx = np.zeros((B, L_exp), np.int32)   # text position or patch index
    pos_mask = np.zeros((B, L_exp), np.bool_)
    img_start = np.zeros((B,), np.int32)
    for b in range(B):
        pad = L_exp - int(exp_lens[b])
        out = pad
        for j in range(L):
            t = int(padded_ids[b, j])
            if t == cfg.pad_id and j < L - int(unpadded[b]):
                continue  # left padding
            if t == IMAGE_TOKEN_INDEX:
                img_start[b] = out
                is_img[b, out : out + n_img] = True
                src_idx[b, out : out + n_img] = np.arange(n_img)
                pos_mask[b, out : out + n_img] = True
                out += n_img
            else:
                src_idx[b, out] = j
                pos_mask[b, out] = True
                out += 1

    txt_emb = params["tok_emb"][jnp.clip(jnp.asarray(padded_ids), 0, cfg.vocab - 1)]
    img_emb = jax.vmap(lambda im: encode_image(params, cfg, im))(images)  # (B, 576, D)
    si = jnp.asarray(src_idx)
    gather_txt = jnp.take_along_axis(txt_emb, si[..., None], axis=1)
    gather_img = jnp.take_along_axis(img_emb, jnp.clip(si, 0, n_img - 1)[..., None], axis=1)
    embeds = jnp.where(jnp.asarray(is_img)[..., None], gather_img, gather_txt)
    embeds = jnp.where(jnp.asarray(pos_mask)[..., None], embeds, 0.0)
    return embeds, jnp.asarray(pos_mask), jnp.asarray(img_start)

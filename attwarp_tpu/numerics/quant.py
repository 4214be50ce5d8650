"""int8 weight quantization (w8a8) for MLLM serving.

TPU-motivated: single-token decode at 7B scale is HBM-bandwidth-bound —
every step streams the full decoder weight set. Storing decoder linears as
int8 halves/quarters the bytes per step versus bf16/f32, and the MXU
multiplies int8×int8 at twice its bf16 rate, so the compute side gets
cheaper too (activations are quantized per token on the fly).

Scheme (AQT-style):
- weights: symmetric per-output-channel int8, scale = max|w| / 127 over the
  input axis — one f32 scale per output feature;
- activations: symmetric per-token (last axis) dynamic int8;
- matmul: int8 × int8 with int32 accumulation
  (``preferred_element_type=int32``), rescaled by the two scales in f32.

Only decoder linears are quantized. Embeddings, the LM head (logit
precision), layernorm weights, and the vision tower (one-shot prefill cost,
tiny vs the decode loop) stay in their original dtype.

The reference framework has no quantization path (pure f16 torch serving,
reference attention_extraction/functions.py:32-38); this is a TPU-serving
addition, validated as drop-in by logits-similarity tests.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DECODER_LINEAR_KEYS: Tuple[str, ...] = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_linear(w: Any) -> Dict[str, jnp.ndarray]:
    """Quantize one linear to int8.

    ``w`` is either a dense (out, in) matrix or a ``{"weight", "bias"}``
    dict (HF linear with bias). Returns ``{"q": int8 (out, in), "s": f32
    (out,)}`` plus ``"b"`` when a bias is present.
    """
    if is_quantized(w):
        return w  # idempotent: quantizing twice is a no-op
    bias = None
    if isinstance(w, dict):
        bias = w["bias"]
        w = w["weight"]
    w32 = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / s[:, None]), -127, 127).astype(jnp.int8)
    out = {"q": q, "s": s}
    if bias is not None:
        out["b"] = jnp.asarray(bias, jnp.float32)
    return out


def apply_linear(h: jnp.ndarray, w: Any) -> jnp.ndarray:
    """``h @ W.T (+ b)`` for every weight form the decoders use.

    - dense (out, in) array            -> plain matmul
    - ``{"weight", "bias"}``           -> matmul + bias
    - ``{"q", "s"[, "b"]}`` (int8)     -> dynamic-activation w8a8 matmul

    The int8 path quantizes activations per token (last axis, symmetric),
    runs an int8×int8 dot with int32 accumulation, and rescales in f32;
    output returns in ``h``'s dtype.
    """
    if not isinstance(w, dict):
        return h @ w.T
    if not is_quantized(w):
        return h @ w["weight"].T + w["bias"]
    h32 = h.astype(jnp.float32)
    ascale = jnp.maximum(jnp.max(jnp.abs(h32), axis=-1, keepdims=True), 1e-12) / 127.0
    hq = jnp.clip(jnp.round(h32 / ascale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        hq, w["q"],
        (((h.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * ascale * w["s"]
    if "b" in w:
        y = y + w["b"]
    return y.astype(h.dtype)


def lm_logits(x: jnp.ndarray, params: Dict[str, Any]) -> jnp.ndarray:
    """Final-hidden -> f32 logits for every lm_head form.

    ``x``: (B, hidden) last-position hidden states. The head is
    ``params["lm_head"]`` (falling back to the tied ``embed_tokens``):

    - dense (vocab, hidden) array -> f32 matmul, bit-identical to the
      original inline form (parity-critical: greedy tokens match HF);
    - ``{"q", "s"}`` int8 (from ``quantize_lm_head``) -> w8a8 matmul with
      int32 accumulation, rescaled to f32.

    WHY the int8 head exists: at Qwen2-VL-7B the 152k-vocab bf16 head is
    1.09 GB — the single largest per-decode-step HBM stream after the
    decoder linears — and the f32-upcast matmul XLA emits for the dense
    form streams a 2.18 GB f32 copy instead. int8 quarters that. Opt-in
    (backend spec ``+lm8``) because logit precision moves: greedy decode
    can flip near-tie tokens (measured parity in tests/test_quant.py).
    """
    w = params.get("lm_head", params["embed_tokens"])
    if is_quantized(w):
        x32 = x.astype(jnp.float32)
        ascale = jnp.maximum(
            jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x32 / ascale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w["q"],
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * ascale * w["s"]
    return x.astype(jnp.float32) @ w.T.astype(jnp.float32)


def quantize_lm_head(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return ``params`` with an int8 ``lm_head`` (untying it from
    ``embed_tokens`` when tied — the embedding lookup keeps its original
    dtype; only the logits matmul reads int8)."""
    out = dict(params)
    out["lm_head"] = quantize_linear(
        params.get("lm_head", params["embed_tokens"]))
    return out


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(token, head) int8 KV quantization.

    ``x`` (..., head_dim) -> (``q`` int8 same shape, ``s`` f32 (...,)) with
    ``s = max|x| / 127`` over the head dimension. One scale per written KV
    slot keeps the error local: a token with small keys is not crushed by a
    batch-mate's outlier.

    TPU-motivated: at 7B serving the decode step is HBM-bound and the KV
    cache is the term that GROWS with batch — bf16 weights are fixed ~13 GiB
    while each batch row adds ``2 * L * S * kvH * hd`` cache bytes. int8
    storage halves that vs bf16 (4x vs f32); the dequant (one multiply) fuses
    into the attention matmul read, so HBM sees int8 + one f32 scale per
    128-byte row (~3% overhead). The reference has no KV strategy at all
    (HF DynamicCache in f16, reference attention_extraction/functions.py).
    """
    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def dequantize_kv(q: jnp.ndarray, s: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of ``quantize_kv`` in the requested compute dtype. Elementwise,
    so XLA fuses it into the consuming attention einsum — the materialized
    HBM tensor stays int8."""
    return q.astype(dtype) * s[..., None].astype(dtype)


def quantize_decoder_params(
    params: Dict[str, Any],
    keys: Sequence[str] = DECODER_LINEAR_KEYS,
) -> Dict[str, Any]:
    """Quantize the per-layer decoder linears of a LLaMA/Qwen2 param tree
    (``params["layers"][i][key]``) to int8; everything else passes through
    unchanged (embeddings, lm_head, norms, rotary)."""
    out = dict(params)
    out["layers"] = [
        {k: (quantize_linear(v) if k in keys else v) for k, v in lp.items()}
        for lp in params["layers"]
    ]
    return out

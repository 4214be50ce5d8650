"""CLIP vision tower (pre-LN ViT) in functional JAX.

Architecture parity with HuggingFace ``CLIPVisionModel`` as used by
LLaVA-1.5 (openai/clip-vit-large-patch14-336): conv patch embedding, class
token, learned positions, pre-layernorm, N transformer blocks with
QuickGELU, and hidden-state tapping at ``vision_feature_layer`` (LLaVA uses
-2 and drops the CLS token).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _act(x: jnp.ndarray, name: str) -> jnp.ndarray:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=(name != "gelu"))
    raise ValueError(name)


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def clip_vision_features(
    params: Dict[str, Any],
    cfg: ClipVisionConfig,
    pixel_values: jnp.ndarray,   # (B, H, W, 3) NHWC, already CLIP-normalized
    feature_layer: int = -2,
    drop_cls: bool = True,
) -> jnp.ndarray:
    """Hidden states at ``feature_layer`` (HF ``output_hidden_states``
    indexing: index 0 is the embedding output, index i the output of block
    i). Returns (B, num_patches[, +1], hidden)."""
    B = pixel_values.shape[0]
    P = cfg.patch_size
    n = cfg.image_size // P

    # compute in the parameter dtype (bf16 serving stays bf16 end-to-end)
    pixel_values = pixel_values.astype(params["patch_weight"].dtype)
    # conv patch embedding == unfold + matmul (patch_w: (hidden, 3*P*P))
    x = pixel_values.reshape(B, n, P, n, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, n * n, P * P * 3)
    patches = x @ params["patch_weight"].T  # (B, n*n, hidden); no bias in CLIP

    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, patches], axis=1)
    h = h + params["position_embedding"][None]
    h = _ln(h, params["pre_layrnorm"], cfg.layer_norm_eps)

    n_blocks = cfg.num_hidden_layers
    stop = feature_layer % (n_blocks + 1)  # hidden_states index -> block count
    for i in range(stop):
        h = _block(params["layers"][i], cfg, h)
    return h[:, 1:] if drop_cls else h


def _block(lp: Dict[str, Any], cfg: ClipVisionConfig, x: jnp.ndarray) -> jnp.ndarray:
    B, T, D = x.shape
    h = _ln(x, lp["layer_norm1"], cfg.layer_norm_eps)
    q = (h @ lp["q_proj"]["weight"].T + lp["q_proj"]["bias"]).reshape(
        B, T, cfg.num_attention_heads, cfg.head_dim
    )
    k = (h @ lp["k_proj"]["weight"].T + lp["k_proj"]["bias"]).reshape(
        B, T, cfg.num_attention_heads, cfg.head_dim
    )
    v = (h @ lp["v_proj"]["weight"].T + lp["v_proj"]["bias"]).reshape(
        B, T, cfg.num_attention_heads, cfg.head_dim
    )
    scale = 1.0 / np.sqrt(cfg.head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
    x = x + attn @ lp["out_proj"]["weight"].T + lp["out_proj"]["bias"]
    h2 = _ln(x, lp["layer_norm2"], cfg.layer_norm_eps)
    mlp = _act(h2 @ lp["fc1"]["weight"].T + lp["fc1"]["bias"], cfg.hidden_act)
    mlp = mlp @ lp["fc2"]["weight"].T + lp["fc2"]["bias"]
    return x + mlp


# CLIP image normalization constants (OPENAI_CLIP_MEAN/STD).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(
    image: jnp.ndarray, cfg: ClipVisionConfig
) -> jnp.ndarray:
    """(H, W, 3) float [0,1] -> CLIP-normalized (S, S, 3) via bilinear resize
    (the 'square-resize' path of LLaVA's process_images)."""
    S = cfg.image_size
    img = jax.image.resize(image.astype(jnp.float32), (S, S, 3), "linear")
    return (img - CLIP_MEAN) / CLIP_STD

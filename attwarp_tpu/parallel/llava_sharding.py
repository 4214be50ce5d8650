"""Tensor-parallel sharding for the JAX LLaVA model.

Megatron-style layout over the ``model`` mesh axis, expressed purely as
parameter shardings — XLA's SPMD partitioner propagates them through the
jitted generate/prefill functions and inserts the all-reduces over ICI:

- attention q/k/v projections and MLP gate/up: column-parallel
  (output-feature axis sharded -> heads split across chips),
- attention output and MLP down: row-parallel (input-feature axis sharded
  -> one psum per layer),
- embeddings / LM head: vocab-parallel,
- norms and biases: replicated.

The KV cache and attention intermediates inherit head-axis sharding by
propagation; nothing in the model code changes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _llama_layer_specs() -> Dict[str, P]:
    return {
        "input_layernorm": P(),
        "post_attention_layernorm": P(),
        # weights are (out_features, in_features); y = x @ W.T
        "q_proj": P("model", None),    # column parallel
        "k_proj": P("model", None),
        "v_proj": P("model", None),
        "o_proj": P(None, "model"),    # row parallel -> psum
        "gate_proj": P("model", None),
        "up_proj": P("model", None),
        "down_proj": P(None, "model"),
    }


def _vision_layer_specs() -> Dict[str, Any]:
    col = {"weight": P("model", None), "bias": P("model")}
    row = {"weight": P(None, "model"), "bias": P()}
    rep = {"weight": P(), "bias": P()}
    return {
        "layer_norm1": rep,
        "layer_norm2": rep,
        "q_proj": col,
        "k_proj": col,
        "v_proj": col,
        "out_proj": row,
        "fc1": col,
        "fc2": row,
    }


def llava_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a LLaVA parameter pytree."""
    n_llama = len(params["llama"]["layers"])
    n_vision = len(params["vision"]["layers"])
    specs: Dict[str, Any] = {
        "vision": {
            "patch_weight": P("model", None),
            "class_embedding": P(),
            "position_embedding": P(),
            "pre_layrnorm": {"weight": P(), "bias": P()},
            "layers": [_vision_layer_specs() for _ in range(n_vision)],
        },
        "projector": {
            "linear_1": {"weight": P("model", None), "bias": P("model")},
            "linear_2": {"weight": P(None, "model"), "bias": P()},
        },
        "llama": {
            "embed_tokens": P("model", None),   # vocab-parallel
            "norm": P(),
            "layers": [_llama_layer_specs() for _ in range(n_llama)],
        },
    }
    if "lm_head" in params["llama"]:
        specs["llama"]["lm_head"] = P("model", None)
    return specs


def _quant_aware(params: Any, spec: Any) -> Any:
    """Expand P leaves into ``{"q", "s"[, "b"]}`` spec dicts wherever the
    matching parameter is an int8-quantized linear (numerics/quant.py):
    the int8 matrix keeps the dense weight's spec; the per-output-channel
    scale (and bias) follow the output axis."""
    from attwarp_tpu.numerics.quant import is_quantized

    if is_quantized(params):
        base = spec["weight"] if isinstance(spec, dict) else spec
        out_ax = base[0] if len(base) >= 1 else None
        q = {"q": base, "s": P(out_ax) if out_ax is not None else P()}
        if "b" in params:
            q["b"] = q["s"]
        return q
    if isinstance(spec, dict):
        return {k: _quant_aware(params[k], v) for k, v in spec.items()}
    if isinstance(spec, list):
        return [_quant_aware(p, s) for p, s in zip(params, spec)]
    return spec


def _divisible(leaf, spec: P, mesh: Mesh) -> P:
    """Drop the 'model' factor on axes the mesh size does not divide."""
    n = mesh.shape["model"]
    dims = []
    for i, s in enumerate(spec):
        if s == "model" and leaf.shape[i] % n != 0:
            dims.append(None)
        else:
            dims.append(s)
    return P(*dims)


def shard_llava_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a LLaVA parameter pytree with tensor-parallel shardings."""
    return _place(params, llava_param_specs(params), mesh)


def _place(params, specs, mesh: Mesh):
    specs = _quant_aware(params, specs)

    def place(leaf, spec):
        spec = _divisible(leaf, spec, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


# ── Qwen2-VL (same Megatron layout; different pytree shape) ────────────


def _qwen_text_layer_specs() -> Dict[str, Any]:
    col = {"weight": P("model", None), "bias": P("model")}
    return {
        "input_layernorm": P(),
        "post_attention_layernorm": P(),
        "q_proj": col,
        "k_proj": col,
        "v_proj": col,
        "o_proj": P(None, "model"),
        "gate_proj": P("model", None),
        "up_proj": P("model", None),
        "down_proj": P(None, "model"),
    }


def _qwen_vision_block_specs() -> Dict[str, Any]:
    rep = {"weight": P(), "bias": P()}
    return {
        "norm1": rep,
        "norm2": rep,
        "qkv": {"weight": P("model", None), "bias": P("model")},
        "proj": {"weight": P(None, "model"), "bias": P()},
        "fc1": {"weight": P("model", None), "bias": P("model")},
        "fc2": {"weight": P(None, "model"), "bias": P()},
    }


def qwen2vl_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    specs: Dict[str, Any] = {
        "vision": {
            "patch_weight": P("model", None),
            "blocks": [
                _qwen_vision_block_specs() for _ in params["vision"]["blocks"]
            ],
            "merger": {
                "ln_q": {"weight": P(), "bias": P()},
                "fc1": {"weight": P("model", None), "bias": P("model")},
                "fc2": {"weight": P(None, "model"), "bias": P()},
            },
        },
        "text": {
            "embed_tokens": P("model", None),
            "norm": P(),
            "layers": [
                _qwen_text_layer_specs() for _ in params["text"]["layers"]
            ],
        },
    }
    if "lm_head" in params["text"]:
        specs["text"]["lm_head"] = P("model", None)
    return specs


def shard_qwen2vl_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Tensor-parallel placement for a Qwen2-VL parameter pytree.

    XLA SPMD preserves semantics regardless of how the fused vision qkv
    splits across the q/k/v boundary; alignment only affects how much
    resharding traffic the partitioner inserts."""
    return _place(params, qwen2vl_param_specs(params), mesh)

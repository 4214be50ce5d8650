"""Shared helpers for the 7B-shape benchmarks.

Random weights at the exact LLaVA-1.5-7B geometry (CLIP-L/14 336px tower +
32-layer 4096-wide decoder): throughput is shape-dependent only, so these
benches measure the real production programs without downloadable weights.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: verified to work through the axon relay
# (second process re-loads a cached executable in ~40 ms). De-risks the
# >10 min 7B flash-prefill compiles (CLAUDE.md) across bench processes.
# Benches default to the repo-local .jax_cache so bench/CLI runs in this
# checkout share executables; the CLIs default to ~/.cache/attwarp_tpu.
from attwarp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache(
    os.environ.get("JAX_COMPILATION_CACHE_DIR")
    or os.environ.get("ATTWARP_COMPILE_CACHE_DIR")
    or os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
)

from attwarp_tpu.models.clip_vit import ClipVisionConfig
from attwarp_tpu.models.llama import LlamaConfig
from attwarp_tpu.models.llava import LlavaConfig, LlavaModel


def make_llava_7b_params(cfg: LlavaConfig, mode: str = "bf16", seed: int = 0):
    """Random 7B-shape LLaVA params; ``mode`` 'int8' quantizes the decoder
    linears (w8a8 layout — {"q", "s"}), everything else bf16."""
    key = [jax.random.PRNGKey(seed)]

    def k():
        key[0], sub = jax.random.split(key[0])
        return sub

    def lin(o, i):
        if mode == "int8":
            q = jax.random.randint(k(), (o, i), -127, 128, dtype=jnp.int8)
            s = jax.random.uniform(k(), (o,), jnp.float32, 0.5, 1.5) / (
                127 * np.sqrt(i))
            return {"q": q, "s": s}
        return jax.random.normal(k(), (o, i), jnp.bfloat16) / float(np.sqrt(i))

    def dense(o, i, scale=None):
        w = jax.random.normal(k(), (o, i), jnp.bfloat16)
        return w * (scale if scale is not None else 1.0 / float(np.sqrt(i)))

    def wb(o, i):
        return {"weight": dense(o, i), "bias": jnp.zeros((o,), jnp.bfloat16)}

    v, t = cfg.vision, cfg.text
    D, I = t.hidden_size, t.intermediate_size
    return {
        "vision": {
            "patch_weight": dense(v.hidden_size, 3 * v.patch_size**2),
            "class_embedding": jax.random.normal(
                k(), (v.hidden_size,), jnp.bfloat16) * 0.02,
            "position_embedding": jax.random.normal(
                k(), (v.num_patches + 1, v.hidden_size), jnp.bfloat16) * 0.02,
            "pre_layrnorm": {"weight": jnp.ones((v.hidden_size,), jnp.bfloat16),
                             "bias": jnp.zeros((v.hidden_size,), jnp.bfloat16)},
            "layers": [
                {
                    "layer_norm1": {
                        "weight": jnp.ones((v.hidden_size,), jnp.bfloat16),
                        "bias": jnp.zeros((v.hidden_size,), jnp.bfloat16)},
                    "layer_norm2": {
                        "weight": jnp.ones((v.hidden_size,), jnp.bfloat16),
                        "bias": jnp.zeros((v.hidden_size,), jnp.bfloat16)},
                    "q_proj": wb(v.hidden_size, v.hidden_size),
                    "k_proj": wb(v.hidden_size, v.hidden_size),
                    "v_proj": wb(v.hidden_size, v.hidden_size),
                    "out_proj": wb(v.hidden_size, v.hidden_size),
                    "fc1": wb(v.intermediate_size, v.hidden_size),
                    "fc2": wb(v.hidden_size, v.intermediate_size),
                }
                for _ in range(v.num_hidden_layers)
            ],
        },
        "projector": {
            "linear_1": wb(D, v.hidden_size),
            "linear_2": wb(D, D),
        },
        "llama": {
            "embed_tokens": jax.random.normal(
                k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
            "lm_head": jax.random.normal(
                k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
            "norm": jnp.ones((D,), jnp.bfloat16),
            "layers": [
                {
                    "q_proj": lin(D, D), "k_proj": lin(D, D),
                    "v_proj": lin(D, D), "o_proj": lin(D, D),
                    "gate_proj": lin(I, D), "up_proj": lin(I, D),
                    "down_proj": lin(D, I),
                    "input_layernorm": jnp.ones((D,), jnp.bfloat16),
                    "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16),
                }
                for _ in range(t.num_hidden_layers)
            ],
        },
    }


def parse_mode(raw: str):
    """'int8+flash+kv8' -> (base mode, kv8, flash) in any suffix order."""
    flash = "+flash" in raw
    raw = raw.replace("+flash", "")
    kv8 = raw.endswith("+kv8")
    if kv8:
        raw = raw[: -len("+kv8")]
    return raw, kv8, flash


def make_llava_7b_backend(mode_spec: str = "bf16", extract_layer: int = 20,
                          tokenizer=None, seed: int = 0):
    """Backend at 7B shape for benches; pass a tokenizer (e.g.
    tools/make_random_7b_ckpt.build_dry_run_tokenizer) for the text-level
    extract/answer APIs."""
    from attwarp_tpu.extract.llava_backend import LlavaBackend

    mode, kv8, flash = parse_mode(mode_spec)
    cfg = LlavaConfig(
        vision=ClipVisionConfig(),  # CLIP-L/14 336px: 24 layers, 1024 wide
        text=LlamaConfig(),         # 7B: 32 layers, 4096/11008
        image_token_index=32000,
    )
    params = make_llava_7b_params(cfg, mode=mode, seed=seed)
    nbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(params))
    label = mode + ("+kv8" if kv8 else "") + ("+flash" if flash else "")
    print(f"params: {nbytes/2**30:.2f} GiB ({label})")
    return LlavaBackend(LlavaModel(cfg, params), tokenizer=tokenizer,
                        extract_layer=extract_layer, kv_quant=kv8,
                        use_flash=flash), label

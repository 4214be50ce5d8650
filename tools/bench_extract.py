"""End-to-end batched extraction throughput at LLaVA-7B shape.

The framework's dominant production cost (SURVEY §3.1): image preprocess →
CLIP tower → 640-token prefill → 20-token greedy decode with layer-20
attention accumulation → 24×24 maps. This is the TPU analogue of the
reference's BATCH_SIZE=32 batched driver (`main_batched.py` →
`attention_extraction/functions.py:188-328`), measured as samples/sec on
one chip.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_extract.py bf16|int8[+kv8] [batch]

Random weights at the exact 7B geometry (CLIP-L/14 336px tower + 32-layer
4096-wide decoder): throughput is shape-dependent only. Preprocessing
(upload + fused resize/CLIP-normalize on device, the driver's path) is
included in the timing. Each timed iteration feeds fresh host images so
nothing is cached across samples.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401  (persistent compile cache config)
from attwarp_tpu.extract.llava_backend import LlavaBackend
from attwarp_tpu.models.clip_vit import ClipVisionConfig
from attwarp_tpu.models.llama import LlamaConfig
from attwarp_tpu.models.llava import LlavaConfig, LlavaModel

MODE = sys.argv[1] if len(sys.argv) > 1 else "bf16"
FLASH = "+flash" in MODE
MODE = MODE.replace("+flash", "")
KV8 = MODE.endswith("+kv8")
if KV8:
    MODE = MODE[: -len("+kv8")]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
T, NEW, LAYER = 640, 20, 20

cfg = LlavaConfig(
    vision=ClipVisionConfig(),          # CLIP-L/14 336px: 24 layers, 1024 wide
    text=LlamaConfig(),                 # 7B: 32 layers, 4096/11008
    image_token_index=32000,
)
key = jax.random.PRNGKey(0)


def k():
    global key
    key, sub = jax.random.split(key)
    return sub


def lin(o, i):
    if MODE == "int8":
        q = jax.random.randint(k(), (o, i), -127, 128, dtype=jnp.int8)
        s = jax.random.uniform(k(), (o,), jnp.float32, 0.5, 1.5) / (127 * np.sqrt(i))
        return {"q": q, "s": s}
    return jax.random.normal(k(), (o, i), jnp.bfloat16) / float(np.sqrt(i))


def dense(o, i, scale=None):
    w = jax.random.normal(k(), (o, i), jnp.bfloat16)
    return w * (scale if scale is not None else 1.0 / float(np.sqrt(i)))


def wb(o, i):
    return {"weight": dense(o, i), "bias": jnp.zeros((o,), jnp.bfloat16)}


v, t = cfg.vision, cfg.text
D, I = t.hidden_size, t.intermediate_size
params = {
    "vision": {
        "patch_weight": dense(v.hidden_size, 3 * v.patch_size**2),
        "class_embedding": jax.random.normal(k(), (v.hidden_size,), jnp.bfloat16) * 0.02,
        "position_embedding": jax.random.normal(
            k(), (v.num_patches + 1, v.hidden_size), jnp.bfloat16) * 0.02,
        "pre_layrnorm": {"weight": jnp.ones((v.hidden_size,), jnp.bfloat16),
                         "bias": jnp.zeros((v.hidden_size,), jnp.bfloat16)},
        "layers": [
            {
                "layer_norm1": {"weight": jnp.ones((v.hidden_size,), jnp.bfloat16),
                                "bias": jnp.zeros((v.hidden_size,), jnp.bfloat16)},
                "layer_norm2": {"weight": jnp.ones((v.hidden_size,), jnp.bfloat16),
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
        "embed_tokens": jax.random.normal(k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
        "lm_head": jax.random.normal(k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
        "norm": jnp.ones((D,), jnp.bfloat16),
        "layers": [
            {
                "q_proj": lin(D, D), "k_proj": lin(D, D), "v_proj": lin(D, D),
                "o_proj": lin(D, D), "gate_proj": lin(I, D),
                "up_proj": lin(I, D), "down_proj": lin(D, I),
                "input_layernorm": jnp.ones((D,), jnp.bfloat16),
                "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16),
            }
            for _ in range(t.num_hidden_layers)
        ],
    },
}
nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
label = MODE + ("+kv8" if KV8 else "") + ("+flash" if FLASH else "")
print(f"params: {nbytes/2**30:.2f} GiB ({label}); B={B} T={T} new={NEW}")

backend = LlavaBackend(LlavaModel(cfg, params), extract_layer=LAYER,
                       kv_quant=KV8, use_flash=FLASH)

# prompt: left-padded ids with the 576-token image span starting at 32
rng = np.random.default_rng(0)
ids = rng.integers(3, 31999, size=(B, T)).astype(np.int64)
ids[:, 32 : 32 + cfg.num_image_tokens] = cfg.image_token_index
mask = np.ones((B, T), np.int64)

raw_images = (rng.random((B, 480, 640, 3)) * 255).astype(np.uint8)


from attwarp_tpu.extract.extraction import resize_images_batch  # noqa: E402
from attwarp_tpu.extract.llava_backend import _clip_normalize_device  # noqa: E402


def one_round(images):
    """Device-batched preprocess + full extraction generate (the driver's
    per-batch work in cli/process_dataset.py: one upload + one fused
    resize+normalize dispatch, pixels stay on device)."""
    pixels = _clip_normalize_device(
        resize_images_batch(list(images), backend.image_size)
    )
    gen, maps = backend.extract_from_ids(ids, mask, pixels, max_new_tokens=NEW)
    return gen, maps


gen, maps = one_round(raw_images)       # compile
assert maps.shape == (B, 24, 24) and np.isfinite(maps).all()
print("compiled; maps ok")

ITERS = 4
times = []
for it in range(3):
    imgs = (rng.random((B, 480, 640, 3)) * 255).astype(np.uint8)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        gen, maps = one_round(imgs)
    times.append((time.perf_counter() - t0) / ITERS)
best = min(times)
print(f"{label}: {best*1e3:.1f} ms/batch (B={B}, prefill {T} + {NEW} decode "
      f"+ maps) -> {B/best:.2f} samples/s")

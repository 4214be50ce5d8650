"""Qwen2-VL-7B decode-step throughput: the second family's serving rate.

Same methodology as tools/bench_decode.py (chained unrolled steps inside
one jit, donated cache) at the Qwen2-VL-7B text geometry — 28 layers,
3584 wide, GQA 28 q-heads / 4 kv-heads. The GQA cache is 8x leaner per
token than LLaVA's MHA cache (kvH 4 vs 32), so decode is weight-stream
dominated and the batch can go far higher before HBM binds; the Pallas
flash-decoding kernel covers the GQA read via its head-group selection
mask (`ops/pallas_decode_attn.py`).

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_qwen_decode.py bf16|int8[+kv8] [batch]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401  (persistent compile cache config)
from attwarp_tpu.models.llama import init_quant_kv_cache, make_decode_prep
from attwarp_tpu.models.qwen2vl import (
    Qwen2VLTextConfig,
    mrope_cos_sin,
    qwen2vl_decode_step,
)

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8+kv8"
LM8 = "+lm8" in MODE          # int8 LM head (numerics/quant.py::lm_logits)
MODE = MODE.replace("+lm8", "")
KV8 = MODE.endswith("+kv8")
if KV8:
    MODE = MODE[: -len("+kv8")]
cfg = Qwen2VLTextConfig()  # 7B text tower: 3584/18944, 28 layers, 28h/4kv
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
T_CTX = 640
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
MAX_SEQ = T_CTX + STEPS
if KV8:
    # 64-multiple cache: the Pallas flash-decoding kernel's seq-tile gate
    MAX_SEQ = -(-MAX_SEQ // 64) * 64
key = jax.random.PRNGKey(0)


def kshape():
    global key
    key, k = jax.random.split(key)
    return k


def lin(o, i):
    if MODE == "int8":
        q = jax.random.randint(kshape(), (o, i), -127, 128, dtype=jnp.int8)
        s = jax.random.uniform(kshape(), (o,), jnp.float32, 0.5, 1.5) / (127 * np.sqrt(i))
        return {"q": q, "s": s}
    return jax.random.normal(kshape(), (o, i), jnp.bfloat16) / float(np.sqrt(i))


def wb(o, i):
    # q/k/v carry biases in Qwen2; the int8 form keeps a bf16 bias term
    w = lin(o, i)
    if isinstance(w, dict) and "q" in w:
        return w | {"b": jnp.zeros((o,), jnp.float32)}
    return {"weight": w, "bias": jnp.zeros((o,), jnp.bfloat16)}


D, I = cfg.hidden_size, cfg.intermediate_size
kvd = cfg.kv_heads * cfg.head_dim
layers = []
for _ in range(cfg.num_hidden_layers):
    layers.append({
        "q_proj": wb(D, D), "k_proj": wb(kvd, D), "v_proj": wb(kvd, D),
        "o_proj": lin(D, D), "gate_proj": lin(I, D), "up_proj": lin(I, D),
        "down_proj": lin(D, I),
        "input_layernorm": jnp.ones((D,), jnp.bfloat16),
        "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16),
    })
params = {
    "embed_tokens": jax.random.normal(kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "lm_head": jax.random.normal(kshape(), (cfg.vocab_size, D), jnp.bfloat16) * 0.02,
    "norm": jnp.ones((D,), jnp.bfloat16),
    "layers": layers,
}
if LM8:
    from attwarp_tpu.numerics.quant import quantize_lm_head

    params = quantize_lm_head(params)
nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
print(f"params: {nbytes/2**30:.2f} GiB ({MODE}{'+lm8' if LM8 else ''})")

if KV8:
    kv = init_quant_kv_cache(cfg, B, MAX_SEQ)
else:
    shape = (cfg.num_hidden_layers, B, MAX_SEQ, cfg.kv_heads, cfg.head_dim)
    kv = (jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))
kv_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(kv))
print(f"kv cache: {kv_bytes/2**30:.2f} GiB ({'int8' if KV8 else 'bf16'}, B={B})")
kv_mask = (jnp.arange(MAX_SEQ)[None, :] < T_CTX + 1).repeat(B, 0)
pos3 = jnp.broadcast_to(jnp.full((B, 1), T_CTX)[None], (3, B, 1))
cos1, sin1 = mrope_cos_sin(pos3, cfg)
emb0 = jax.random.normal(kshape(), (B, 1, D), jnp.bfloat16) * 0.1


@partial(jax.jit, donate_argnums=(2,))
def run(params, emb0, kv):
    # unrolled chain, same reasoning as tools/bench_decode.py
    emb, probe = emb0, jnp.float32(0)
    prep = make_decode_prep(kv)   # scale relayout paid once per chain
    for _ in range(STEPS):
        if prep is None:
            logits, kv, _ = qwen2vl_decode_step(
                params, cfg, emb, kv, jnp.int32(T_CTX), cos1, sin1, kv_mask
            )
        else:
            logits, kv, _, prep = qwen2vl_decode_step(
                params, cfg, emb, kv, jnp.int32(T_CTX), cos1, sin1, kv_mask,
                prep=prep,
            )
        nxt = jnp.argmax(logits, axis=-1)
        emb = params["embed_tokens"][nxt][:, None, :]
        probe = probe + logits[0, 0]
    return emb[0, 0, 0] + probe, kv


out, kv = run(params, emb0, kv)
print("compiled; first result:", jax.device_get(out))
times = []
for _ in range(3):
    t0 = time.perf_counter()
    out, kv = run(params, emb0, kv)
    jax.device_get(out)
    times.append(time.perf_counter() - t0)
best = min(times)
per_step = best / STEPS * 1e3
label = MODE + ("+kv8" if KV8 else "") + ("+lm8" if LM8 else "")
print(f"{label}: {best*1e3:.1f} ms for {STEPS} steps -> "
      f"{per_step:.2f} ms/step ({B/per_step*1e3:.1f} tok/s at B={B})")

"""Decode-step throughput at LLaVA-7B shape: bf16 vs int8 (w8a8) weights,
optionally with an int8 KV cache ('+kv8').

Source of the numbers in ARCHITECTURE.md "int8 serving": on one v5e,
B=1: bf16 20.9 ms/step (47.8 tok/s) vs int8 12.8 ms/step (78.0 tok/s);
int8 B=8 reaches 207.5 tok/s while bf16 OOMs past B=2.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_decode.py bf16|int8[+kv8] [batch]
Chained decode steps inside one jit (argmax -> embed feeds the next step)
so the relay can't return early and XLA can't hoist anything.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.models.llama import (
    LlamaConfig,
    LlamaKVCache,
    init_quant_kv_cache,
    llama_decode_step,
    make_decode_prep,
)

MODE = sys.argv[1] if len(sys.argv) > 1 else "bf16"
LM8 = "+lm8" in MODE          # int8 LM head (numerics/quant.py::lm_logits)
MODE = MODE.replace("+lm8", "")
KV8 = MODE.endswith("+kv8")
if KV8:
    MODE = MODE[: -len("+kv8")]
cfg = LlamaConfig()  # 7B: 4096 / 11008 / 32 layers / 32 heads, vocab 32000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
T_CTX = 640
# 16 unrolled steps: enough timed work to swamp relay timing noise
# (>=250 ms at B>=8) while keeping the unrolled program's compile bounded
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
MAX_SEQ = T_CTX + STEPS
if KV8:
    # 64-multiple cache: the Pallas flash-decoding kernel's seq-tile gate
    # (matches what generate/ServeEngine allocate for quant caches)
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


D, I = cfg.hidden_size, cfg.intermediate_size
layers = []
for _ in range(cfg.num_hidden_layers):
    layers.append({
        "q_proj": lin(D, D), "k_proj": lin(D, D), "v_proj": lin(D, D),
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
    kv = LlamaKVCache(
        jnp.zeros((cfg.num_hidden_layers, B, MAX_SEQ, cfg.kv_heads, cfg.head_dim), jnp.bfloat16),
        jnp.zeros((cfg.num_hidden_layers, B, MAX_SEQ, cfg.kv_heads, cfg.head_dim), jnp.bfloat16),
    )
kv_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(kv))
print(f"kv cache: {kv_bytes/2**30:.2f} GiB ({'int8' if KV8 else 'bf16'}, B={B})")
kv_mask = (jnp.arange(MAX_SEQ)[None, :] < T_CTX + 1).repeat(B, 0)
positions = jnp.full((B,), T_CTX, jnp.int32)
emb0 = jax.random.normal(kshape(), (B, 1, D), jnp.bfloat16)


@partial(jax.jit, donate_argnums=(2,))   # donate the cache: in real serving
def run(params, emb0, kv):               # it lives inside one jit, so only
                                         # one copy exists
    # UNROLLED chain (argmax -> embed feeds the next step), not lax.scan:
    # a scan carries the cache as loop state and XLA double-buffers loop
    # carries — two live cache copies, which both skewed the measurement
    # and OOM'd B=32 (the serving engine's chunk step was unrolled for the
    # same reason; round-3 change)
    emb, probe = emb0, jnp.float32(0)
    prep = make_decode_prep(kv)   # scale relayout paid once per chain
    for _ in range(STEPS):
        if prep is None:
            logits, kv, _ = llama_decode_step(
                params, cfg, emb, kv, jnp.int32(T_CTX), positions, kv_mask
            )
        else:
            logits, kv, _, prep = llama_decode_step(
                params, cfg, emb, kv, jnp.int32(T_CTX), positions, kv_mask,
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
print(f"{label}: {best*1e3:.1f} ms for {STEPS} steps -> {per_step:.2f} ms/step "
      f"({B / (best / STEPS):.1f} tok/s at B={B})")

"""Continuous-batching engine throughput at Qwen2-VL-7B shape.

The second family's serving headline, mirroring tools/bench_serve.py:
a stream of ~640-token text requests through ``ServeEngine`` on one chip,
aggregate generated tok/s with admission included. Qwen2-VL's GQA cache
(kvH 4 vs LLaVA's 32) is 8x leaner per slot, so the pool goes far wider
before HBM binds (64 int8 slots = 1.4 GiB beside the 8.1 GiB int8
weights); the comparable fixed-batch ceiling is tools/bench_qwen_decode.py
(2573.7 tok/s at int8+kv8 B=64). Admission uses the batched grouped
prefill (``_prefill_qwen_group``) — per-request admission would dominate
wall clock at this width.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_qwen_serve.py bf16|int8[+kv8][+flash] [slots] [requests] [max_new] [chunk_impl] [tick] [admit]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401  (persistent compile cache config)
from attwarp_tpu.models.qwen2vl import Qwen2VLConfig, Qwen2VLModel
from attwarp_tpu.serving import ServeEngine

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8+kv8"
FLASH = "+flash" in MODE
MODE = MODE.replace("+flash", "")
KV8 = MODE.endswith("+kv8")
if KV8:
    MODE = MODE[: -len("+kv8")]
SLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_REQ = int(sys.argv[3]) if len(sys.argv) > 3 else 3 * SLOTS
MAX_NEW = int(sys.argv[4]) if len(sys.argv) > 4 else 128
CHUNK = sys.argv[5] if len(sys.argv) > 5 else "auto"
TICK = int(sys.argv[6]) if len(sys.argv) > 6 else 16
ADMIT = int(sys.argv[7]) if len(sys.argv) > 7 else 4
MAX_SEQ = -(-(640 + MAX_NEW + TICK) // 16) * 16

cfg = Qwen2VLConfig()   # 7B: text 3584/18944, 28 layers, 28q/4kv heads
key = jax.random.PRNGKey(0)


def k():
    global key
    key, s = jax.random.split(key)
    return s


def lin(o, i):
    if MODE == "int8":
        q = jax.random.randint(k(), (o, i), -127, 128, dtype=jnp.int8)
        s = jax.random.uniform(k(), (o,), jnp.float32, 0.5, 1.5) / (127 * np.sqrt(i))
        return {"q": q, "s": s}
    return jax.random.normal(k(), (o, i), jnp.bfloat16) / float(np.sqrt(i))


def wb(o, i):
    # q/k/v carry biases in Qwen2; the int8 form keeps an f32 bias term
    w = lin(o, i)
    if isinstance(w, dict) and "q" in w:
        return w | {"b": jnp.zeros((o,), jnp.float32)}
    return {"weight": w, "bias": jnp.zeros((o,), jnp.bfloat16)}


t = cfg.text
D, I = t.hidden_size, t.intermediate_size
kvd = t.kv_heads * t.head_dim
params = {"text": {
    "embed_tokens": jax.random.normal(k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
    "lm_head": jax.random.normal(k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
    "norm": jnp.ones((D,), jnp.bfloat16),
    "layers": [
        {"q_proj": wb(D, D), "k_proj": wb(kvd, D), "v_proj": wb(kvd, D),
         "o_proj": lin(D, D), "gate_proj": lin(I, D), "up_proj": lin(I, D),
         "down_proj": lin(D, I),
         "input_layernorm": jnp.ones((D,), jnp.bfloat16),
         "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16)}
        for _ in range(t.num_hidden_layers)
    ],
}}
# text-only requests: the vision tower is never traced (grid None takes the
# embed branch), so no vision params are materialized
model = Qwen2VLModel(cfg, params)
nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
print(f"params: {nbytes/2**30:.2f} GiB ({MODE})")
rng = np.random.default_rng(0)

label = MODE + ("+kv8" if KV8 else "") + ("+flash" if FLASH else "")
print(f"engine: {label}, slots={SLOTS}, requests={N_REQ}, max_new={MAX_NEW}, "
      f"chunk={CHUNK}, tick={TICK}, admit={ADMIT}, max_seq={MAX_SEQ}")

# warm every batched-admission group size + the chunk step, then drop the
# warm-up engine's cache BEFORE allocating the measured one (two live
# caches distort capacity; see tools/bench_serve.py)
warm = ServeEngine(model, slots=SLOTS, max_seq=MAX_SEQ, bucket=64,
                   kv_quant=KV8, chunk_impl=CHUNK, steps_per_tick=TICK,
                   use_flash=FLASH, admit_batch=ADMIT)
size = 1
while size <= min(ADMIT, SLOTS):
    for _ in range(size):
        ids = rng.integers(3, 150000, size=(600,)).astype(np.int64)
        warm.submit(ids, None, max_new_tokens=2)
    warm.run()
    size *= 2
del warm

eng = ServeEngine(model, slots=SLOTS, max_seq=MAX_SEQ, bucket=64,
                  kv_quant=KV8, chunk_impl=CHUNK, steps_per_tick=TICK,
                  use_flash=FLASH, admit_batch=ADMIT)
for _ in range(N_REQ):
    T = int(rng.integers(577, 640))   # one 64-token bucket (=> 640)
    ids = rng.integers(3, 150000, size=(T,)).astype(np.int64)
    eng.submit(ids, None, max_new_tokens=MAX_NEW)
t0 = time.perf_counter()
out = eng.run()
dt = time.perf_counter() - t0
total_new = sum(len(v) for v in out.values())
stats = [s for s in eng.request_stats.values() if "done" in s]
ttft = np.asarray([s["first_token"] - s["submit"] for s in stats]) * 1e3
turn = np.asarray([s["done"] - s["submit"] for s in stats]) * 1e3
print(f"{label}: {N_REQ} requests, {total_new} tokens in {dt:.1f}s -> "
      f"{total_new/dt:.1f} tok/s aggregate")
print(f"  TTFT  ms: mean {ttft.mean():.0f}  p50 {np.percentile(ttft, 50):.0f}"
      f"  p95 {np.percentile(ttft, 95):.0f}")
# first wave = the first SLOTS submitted requests (zero queue wait): their
# TTFT is pure admission latency (mirrors tools/bench_serve.py)
wave = [eng.request_stats[r] for r in sorted(eng.request_stats)[:SLOTS]
        if "first_token" in eng.request_stats[r]]
if wave:
    wttft = np.asarray([s["first_token"] - s["submit"] for s in wave]) * 1e3
    print(f"  first-wave TTFT ms (n={len(wave)}): "
          f"p50 {np.percentile(wttft, 50):.0f}  p95 {np.percentile(wttft, 95):.0f}")
print(f"  turn  ms: mean {turn.mean():.0f}  p50 {np.percentile(turn, 50):.0f}"
      f"  p95 {np.percentile(turn, 95):.0f}")

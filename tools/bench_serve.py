"""Continuous-batching engine throughput at LLaVA-7B shape.

A stream of requests (random prompt lengths, one 64-token length bucket
each) through ``ServeEngine`` on one chip: aggregate generated tok/s and
per-request latency. The reference has no serving counterpart; the
comparable internal number is tools/bench_decode.py's fixed-batch decode
(1355 tok/s at int8+kv8 B=32 via the flash-decoding kernel), which a real
request stream can't sustain
without continuous batching — this measures how close the engine gets with
admission/harvest overhead included.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_serve.py bf16|int8[+kv8] [slots] [requests] [max_new] [chunk_impl]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401  (persistent compile cache config)
from attwarp_tpu.models.clip_vit import ClipVisionConfig
from attwarp_tpu.models.llama import LlamaConfig
from attwarp_tpu.models.llava import LlavaConfig, LlavaModel
from attwarp_tpu.serving import ServeEngine

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8+kv8"
FLASH = "+flash" in MODE
MODE = MODE.replace("+flash", "")
KV8 = MODE.endswith("+kv8")
if KV8:
    MODE = MODE[: -len("+kv8")]
SLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_REQ = int(sys.argv[3]) if len(sys.argv) > 3 else 24
MAX_NEW = int(sys.argv[4]) if len(sys.argv) > 4 else 32
CHUNK = sys.argv[5] if len(sys.argv) > 5 else "auto"
TICK = int(sys.argv[6]) if len(sys.argv) > 6 else 8
ADMIT = int(sys.argv[7]) if len(sys.argv) > 7 else 4
# startup-ramp cap (engine arg admit_batch_cold): 0 = engine auto
# (min(slots, 8)), 1 = ramp disabled (classic behavior)
ADMIT_COLD = int(sys.argv[8]) if len(sys.argv) > 8 else 0
# size the slot cache from the workload: 640-token prompt bucket + answer +
# chunk slack, rounded up to 16 (768 for the classic 96-new config)
MAX_SEQ = -(-(640 + MAX_NEW + TICK) // 16) * 16

cfg = LlavaConfig(vision=ClipVisionConfig(), text=LlamaConfig(),
                  image_token_index=32000)
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


t = cfg.text
D, I = t.hidden_size, t.intermediate_size
params = {"llama": {
    "embed_tokens": jax.random.normal(k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
    "lm_head": jax.random.normal(k(), (t.vocab_size, D), jnp.bfloat16) * 0.02,
    "norm": jnp.ones((D,), jnp.bfloat16),
    "layers": [
        {"q_proj": lin(D, D), "k_proj": lin(D, D), "v_proj": lin(D, D),
         "o_proj": lin(D, D), "gate_proj": lin(I, D), "up_proj": lin(I, D),
         "down_proj": lin(D, I),
         "input_layernorm": jnp.ones((D,), jnp.bfloat16),
         "post_attention_layernorm": jnp.ones((D,), jnp.bfloat16)}
        for _ in range(t.num_hidden_layers)
    ],
}}
model = LlavaModel(cfg, params)
rng = np.random.default_rng(0)

label = MODE + ("+kv8" if KV8 else "") + ("+flash" if FLASH else "")
print(f"engine: {label}, slots={SLOTS}, requests={N_REQ}, max_new={MAX_NEW}, "
      f"chunk={CHUNK}, tick={TICK}, admit={ADMIT}, "
      f"admit_cold={ADMIT_COLD}, max_seq={MAX_SEQ}")

# warm the compiles (one prefill bucket + the step) with a tiny run,
# then drop the warm-up engine's KV cache BEFORE allocating the measured
# one: two live caches double HBM (~6 GiB at 7B dense bf16 next to 13 GiB
# of weights) and distort capacity comparisons
warm = ServeEngine(model, slots=SLOTS, max_seq=MAX_SEQ, bucket=64, kv_quant=KV8,
                   chunk_impl=CHUNK, steps_per_tick=TICK, use_flash=FLASH,
                   admit_batch=ADMIT, admit_batch_cold=ADMIT_COLD)
# warm EVERY batched-admission group size on top of the chunk step, so no
# compile lands inside the measured run: one wave per power-of-two size
# <= min(admit_batch, slots) guarantees the admission decomposes to exactly
# that size (a single descending-pow2 wave of capped length misses sizes
# when admit_batch > 8, and mid-run slot-availability patterns can produce
# any of them)
size = 1
while size <= min(warm.admit_batch_cold, SLOTS):
    for _ in range(size):
        ids = rng.integers(3, 31999, size=(600,)).astype(np.int64)
        warm.submit(ids, None, max_new_tokens=2)
    warm.run()
    size *= 2
del warm

eng = ServeEngine(model, slots=SLOTS, max_seq=MAX_SEQ, bucket=64, kv_quant=KV8,
                  chunk_impl=CHUNK, steps_per_tick=TICK, use_flash=FLASH,
                  admit_batch=ADMIT, admit_batch_cold=ADMIT_COLD)
total_new = 0
for _ in range(N_REQ):
    T = int(rng.integers(577, 640))   # one 64-token bucket (=> 640)
    ids = rng.integers(3, 31999, size=(T,)).astype(np.int64)
    eng.submit(ids, None, max_new_tokens=MAX_NEW)
t0 = time.perf_counter()
out = eng.run()
dt = time.perf_counter() - t0
total_new = sum(len(v) for v in out.values())
stats = [s for s in eng.request_stats.values() if "done" in s]
ttft = np.asarray([s["first_token"] - s["submit"] for s in stats]) * 1e3
turn = np.asarray([s["done"] - s["submit"] for s in stats]) * 1e3
# first wave = the first SLOTS submitted requests: they see zero queue
# wait, so their TTFT is pure admission latency (the chunked-vs-batched
# question); later requests' TTFT is dominated by offline queue depth
wave = [eng.request_stats[r] for r in sorted(eng.request_stats)[:SLOTS]
        if "first_token" in eng.request_stats[r]]
wttft = np.asarray([s["first_token"] - s["submit"] for s in wave]) * 1e3
print(f"{label}: {N_REQ} requests, {total_new} tokens in {dt:.1f}s -> "
      f"{total_new/dt:.1f} tok/s aggregate")
print(f"  TTFT  ms: mean {ttft.mean():.0f}  p50 {np.percentile(ttft, 50):.0f}"
      f"  p95 {np.percentile(ttft, 95):.0f}")
print(f"  first-wave TTFT ms (n={len(wave)}): "
      f"p50 {np.percentile(wttft, 50):.0f}  p95 {np.percentile(wttft, 95):.0f}")
print(f"  turn  ms: mean {turn.mean():.0f}  p50 {np.percentile(turn, 50):.0f}"
      f"  p95 {np.percentile(turn, 95):.0f}")

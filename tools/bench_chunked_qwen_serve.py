"""Chunked-prefill engine throughput at Qwen2-VL-7B shape.

The second family is the decode champion (tools/bench_qwen_decode.py:
2573.7 tok/s fixed-batch at int8+kv8 B=64) and therefore the MOST
admission-bound under the monolithic engine (tools/bench_qwen_serve.py:
793.4 tok/s aggregate at 64 slots — ~31% of the decode ceiling).
``ChunkedPrefillEngine`` threads the 640-token admissions through the
decode ticks, so prefill stops paying dedicated wall-clock.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_chunked_qwen_serve.py \
          bf16|int8[+kv8] [slots] [requests] [max_new] [P] [tick]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401  (persistent compile cache config)
from attwarp_tpu.models.qwen2vl import Qwen2VLConfig, Qwen2VLModel
from attwarp_tpu.serving import ChunkedPrefillEngine

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8+kv8"
KV8 = MODE.endswith("+kv8")
if KV8:
    MODE = MODE[: -len("+kv8")]
SLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N_REQ = int(sys.argv[3]) if len(sys.argv) > 3 else 3 * SLOTS
MAX_NEW = int(sys.argv[4]) if len(sys.argv) > 4 else 128
P = int(sys.argv[5]) if len(sys.argv) > 5 else 320
TICK = int(sys.argv[6]) if len(sys.argv) > 6 else 16
MAX_SEQ = -(-(640 + MAX_NEW + TICK) // 16) * 16
STAGE = 640

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
model = Qwen2VLModel(cfg, params)
rng = np.random.default_rng(0)

label = MODE + ("+kv8" if KV8 else "")
print(f"chunked qwen engine: {label}, slots={SLOTS}, requests={N_REQ}, "
      f"max_new={MAX_NEW}, P={P}, tick={TICK}, max_seq={MAX_SEQ}")


def mk_engine():
    return ChunkedPrefillEngine(
        model, slots=SLOTS, max_seq=MAX_SEQ, bucket=64, kv_quant=KV8,
        steps_per_tick=TICK, prefill_chunk=P, stage_len=STAGE,
    )


warm = mk_engine()
for _ in range(2):
    ids = rng.integers(3, 150000, size=(600,)).astype(np.int64)
    warm.submit(ids, None, max_new_tokens=2)
warm.run()
del warm

eng = mk_engine()
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
print(f"{label} chunked P={P}: {N_REQ} requests, {total_new} tokens in "
      f"{dt:.1f}s -> {total_new/dt:.1f} tok/s aggregate")
print(f"  TTFT  ms: mean {ttft.mean():.0f}  p50 {np.percentile(ttft, 50):.0f}"
      f"  p95 {np.percentile(ttft, 95):.0f}")
print(f"  turn  ms: mean {turn.mean():.0f}  p50 {np.percentile(turn, 50):.0f}"
      f"  p95 {np.percentile(turn, 95):.0f}")

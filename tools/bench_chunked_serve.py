"""Chunked-prefill engine throughput at LLaVA-7B shape.

The single-chip answer to the admission bound: tools/bench_serve.py's best
(32 slots, int8+kv8, 684.3 tok/s aggregate) is ~99% of the SERIALIZED
decode+prefill ideal — half the wall clock is dedicated 640-token prefills.
``ChunkedPrefillEngine`` threads those prompts through the decode ticks in
P-token chunks (one weight stream for both), so the comparable ceiling is
the fixed-batch decode rate itself (1355 tok/s at B=32).

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_chunked_serve.py \
          bf16|int8[+kv8] [slots] [requests] [max_new] [P] [tick]
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
from attwarp_tpu.serving import ChunkedPrefillEngine

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8+kv8"
KV8 = MODE.endswith("+kv8")
if KV8:
    MODE = MODE[: -len("+kv8")]
SLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_REQ = int(sys.argv[3]) if len(sys.argv) > 3 else 3 * SLOTS
MAX_NEW = int(sys.argv[4]) if len(sys.argv) > 4 else 128
P = int(sys.argv[5]) if len(sys.argv) > 5 else 160
TICK = int(sys.argv[6]) if len(sys.argv) > 6 else 16
MAX_SEQ = -(-(640 + MAX_NEW + TICK) // 16) * 16
STAGE = 640   # the 640-token prompt bucket

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

label = MODE + ("+kv8" if KV8 else "")
print(f"chunked engine: {label}, slots={SLOTS}, requests={N_REQ}, "
      f"max_new={MAX_NEW}, P={P}, tick={TICK}, max_seq={MAX_SEQ}")


def mk_engine():
    return ChunkedPrefillEngine(
        model, slots=SLOTS, max_seq=MAX_SEQ, bucket=64, kv_quant=KV8,
        steps_per_tick=TICK, prefill_chunk=P, stage_len=STAGE,
    )


# warm the one fused-tick compile + the 640-bucket embed program, then drop
# the warm engine's cache/staging before allocating the measured ones
warm = mk_engine()
for _ in range(2):
    ids = rng.integers(3, 31999, size=(600,)).astype(np.int64)
    warm.submit(ids, None, max_new_tokens=2)
warm.run()
del warm

eng = mk_engine()
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
# first wave = the first SLOTS submitted requests (zero queue wait): pure
# admission latency, the metric chunked prefill claims to improve
wave = [eng.request_stats[r] for r in sorted(eng.request_stats)[:SLOTS]
        if "first_token" in eng.request_stats[r]]
wttft = np.asarray([s["first_token"] - s["submit"] for s in wave]) * 1e3
print(f"{label} chunked P={P}: {N_REQ} requests, {total_new} tokens in "
      f"{dt:.1f}s -> {total_new/dt:.1f} tok/s aggregate")
print(f"  TTFT  ms: mean {ttft.mean():.0f}  p50 {np.percentile(ttft, 50):.0f}"
      f"  p95 {np.percentile(ttft, 95):.0f}")
print(f"  first-wave TTFT ms (n={len(wave)}): "
      f"p50 {np.percentile(wttft, 50):.0f}  p95 {np.percentile(wttft, 95):.0f}")
print(f"  turn  ms: mean {turn.mean():.0f}  p50 {np.percentile(turn, 50):.0f}"
      f"  p95 {np.percentile(turn, 95):.0f}")

"""Token-cadence A/B: does chunked prefill remove the admission stall?

VERDICT r4 item 3: after losing the single-chip throughput/TTFT A/B
(tools/bench_chunked_serve.py, ARCHITECTURE.md serving table), chunked
prefill's surviving claim is a NO-STALL property — resident slots keep
emitting tokens through a mid-run admission because the prompt rides the
same fused tick, where the batched engine runs a dedicated prefill program
during which every resident slot is silent. This tool measures that claim
directly on a CPU TP mesh (the claimed regime is a multi-chip serving
group; the stall is structural — a dedicated prefill program stalls the
whole group — so a CPU mesh exhibits the same cadence shape).

Method: both engines get an identical workload — SLOTS initial requests
with staggered max_new (so slots retire at different times) plus SLOTS
more queued behind them (admitted mid-run while survivors decode). The
engines' tick_log records, per tick, (wall-clock, tokens consumed per
request); per-request token timestamps are tick-end times, and the
inter-token gaps of requests RESIDENT across an admission carry the
stall. Reported per engine: p50/p90/max inter-token gap, the stall ratio
(mean resident gap across an admission window / median steady gap), and
wall/token totals (cost check).

Run (CPU mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=.:$PYTHONPATH python tools/bench_chunked_cadence.py
"""

import json
import os
import sys
import time

import numpy as np

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

# sitecustomize preloads jax with the axon plugin; querying any backend
# before this update would initialize axon (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from attwarp_tpu.models import (  # noqa: E402
    ClipVisionConfig,
    LlamaConfig,
    LlavaConfig,
    LlavaModel,
)
from attwarp_tpu.parallel.llava_sharding import shard_llava_params  # noqa: E402
from attwarp_tpu.serving import ChunkedPrefillEngine, ServeEngine  # noqa: E402
from __graft_entry__ import _random_llava_params  # noqa: E402

SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
TICK = 2
BUCKET = 64
PROMPT = 300          # -> 320-token bucket: prefill ≫ one decode tick
MAX_SEQ = 448
P = 64                # chunk tokens per fused tick step

cfg = LlavaConfig(
    vision=ClipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    ),
    text=LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=MAX_SEQ,
    ),
    image_token_index=500,
)

devs = np.array(jax.devices()[:8]).reshape(4, 2)
mesh = Mesh(devs, ("data", "model"))
params = shard_llava_params(_random_llava_params(cfg, jax.random.PRNGKey(5)),
                            mesh)
model = LlavaModel(cfg, params)
rng = np.random.default_rng(7)


def workload(eng):
    maxnew = [24, 30, 36, 48] * (SLOTS // 4 + 1)
    for i in range(2 * SLOTS):
        T = PROMPT + int(rng.integers(0, 12))
        ids = rng.integers(3, 490, size=(T,)).astype(np.int64)
        eng.submit(ids, None, max_new_tokens=maxnew[i % len(maxnew)])


def token_times(eng):
    """{rid: [wall-clock per consumed token]} from the engine's tick_log
    (+ the prefill first token from request_stats)."""
    tt = {}
    for rid, st in eng.request_stats.items():
        if "first_token" in st:
            tt[rid] = [st["first_token"]]
    for t_end, took in eng.tick_log:
        for rid, n in took.items():
            tt.setdefault(rid, []).extend([t_end] * n)
    return tt


def cadence(eng, admit_windows):
    tt = token_times(eng)
    gaps, stall, steady = [], [], []
    for rid, ts in tt.items():
        g = np.diff(np.asarray(ts))
        g = g[g > 0]
        gaps.extend(g)
        for a0, a1 in admit_windows:
            # resident across this admission: emitted both before and after
            ts_a = np.asarray(ts)
            if (ts_a < a0).any() and (ts_a > a1).any():
                i = int(np.searchsorted(ts_a, a0))
                if 0 < i < len(ts_a):
                    stall.append(ts_a[i] - ts_a[i - 1])
    gaps = np.asarray(sorted(gaps))
    if len(gaps):
        med = float(np.median(gaps))
        steady = gaps[gaps <= 3 * med]
    return {
        "gap_p50_ms": round(float(np.percentile(gaps, 50)) * 1e3, 2),
        "gap_p90_ms": round(float(np.percentile(gaps, 90)) * 1e3, 2),
        "gap_max_ms": round(float(gaps.max()) * 1e3, 2),
        "admission_gap_mean_ms": round(float(np.mean(stall)) * 1e3, 2)
        if stall else None,
        "admission_gap_max_ms": round(float(np.max(stall)) * 1e3, 2)
        if stall else None,
        "steady_gap_mean_ms": round(float(np.mean(steady)) * 1e3, 2)
        if len(steady) else None,
        "n_admission_gaps": len(stall),
    }


def run_batched():
    eng = ServeEngine(model, slots=SLOTS, max_seq=MAX_SEQ, bucket=BUCKET,
                      kv_quant=True, steps_per_tick=TICK)
    workload(eng)
    t0 = time.perf_counter()
    out = eng.run()
    dt = time.perf_counter() - t0
    # mid-run admissions only: the first admit_log entry is the initial
    # wave (no residents to stall)
    windows = eng.admit_log[1:]
    r = cadence(eng, [(a, b) for a, b, _ in windows])
    r |= {"wall_s": round(dt, 2),
          "tokens": int(sum(len(v) for v in out.values())),
          "mid_run_admissions": len(windows)}
    return r


def run_chunked():
    eng = ChunkedPrefillEngine(model, slots=SLOTS, max_seq=MAX_SEQ,
                               bucket=BUCKET, kv_quant=True,
                               steps_per_tick=TICK, prefill_chunk=P,
                               stage_len=320)
    workload(eng)
    t0 = time.perf_counter()
    out = eng.run()
    dt = time.perf_counter() - t0
    # admission windows: submit -> first_token of the LATE requests (the
    # chunked engine has no dedicated-prefill admit_log; its admissions
    # are spread over the ticks in this window)
    stats = eng.request_stats
    late = sorted(stats)[SLOTS:]
    windows = [(stats[r]["first_token"] - 1e-4, stats[r]["first_token"])
               for r in late if "first_token" in stats[r]]
    r = cadence(eng, windows)
    r |= {"wall_s": round(dt, 2),
          "tokens": int(sum(len(v) for v in out.values())),
          "mid_run_admissions": len(windows)}
    return r


def main():
    # warm both engines' compiles so cadence isn't compile noise: run the
    # full workload once, discard, run again measured
    print("warming + measuring batched ...")
    run_batched()
    batched = run_batched()
    print(json.dumps(batched, indent=2))
    print("warming + measuring chunked ...")
    run_chunked()
    chunked = run_chunked()
    print(json.dumps(chunked, indent=2))
    report = {
        "config": {"slots": SLOTS, "tick": TICK, "prompt_bucket": 320,
                   "max_seq": MAX_SEQ, "P": P, "mesh": "cpu dp4 x tp2",
                   "model": "tiny-llava h256 L4 (structural cadence probe)"},
        "batched": batched,
        "chunked": chunked,
        "note": (
            "CPU TP-mesh cadence probe of chunked prefill's surviving "
            "multi-chip claim (no resident-slot stall across admissions). "
            "admission_gap_* is the inter-token gap resident requests see "
            "across a mid-run admission; steady_gap_mean is their normal "
            "tick cadence. Absolute times are CPU-scale; the RATIO "
            "admission_gap/steady_gap is the structural result."),
    }
    out = os.environ.get("CADENCE_OUT", "eval_results/chunked_cadence_ab.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print("wrote", out)


if __name__ == "__main__":
    main()

"""Decompose the flash-decoding kernel's cost: fixed per-call overhead vs
per-byte streaming rate, and the effect of the seq-tile size.

Round-3 data (tools/bench_attn_forms.py, S=672 kvH=32) fits
t(B) ~ 95 us fixed per call + 7.5 us per batch row — the fixed part alone
is ~3 ms/step across 32 layers and dominates Qwen2-VL's small-cache reads.
This tool measures that decomposition directly:

  probe   tiny-S call (S=64): per-call time ~ pure launch/fixed cost
  sweep   per-call time vs B at fixed S (the linear fit)
  tiles   per-call time vs seq_tile at the Qwen (kvH=4) and LLaVA
          (kvH=32) geometries — bigger tiles = fewer, larger DMAs

Each timing chains ITERS kernel calls inside one jit with a data
dependency (q fed from the previous output) — CLAUDE.md relay rules.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/bench_kernel_overhead.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401
from attwarp_tpu.ops.pallas_decode_attn import (
    _seq_tile,
    decode_attn_quantcache,
    prepare_decode_attn_operands,
)

ITERS = int(os.environ.get("KOV_ITERS", "200"))
HD = 128


def time_chain(B, S, kvH, H, seq_tile=0, iters=ITERS):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    L = 1
    k_q = jax.random.randint(ks[0], (L, B, S, kvH, HD), -127, 128,
                             dtype=jnp.int8)
    v_q = jax.random.randint(ks[1], (L, B, S, kvH, HD), -127, 128,
                             dtype=jnp.int8)
    k_s = jax.random.uniform(ks[2], (L, B, S, kvH), jnp.float32,
                             0.5, 1.5) / 127
    v_s = jax.random.uniform(ks[3], (L, B, S, kvH), jnp.float32,
                             0.5, 1.5) / 127
    mask = jnp.ones((B, S), bool)
    k1q = jax.random.randint(ks[4], (B, 1, kvH, HD), -127, 128,
                             dtype=jnp.int8)
    k1s = jnp.full((B, 1, kvH), 0.01, jnp.float32)
    q0 = jax.random.normal(ks[5], (B, 1, H, HD), jnp.bfloat16)
    sm = 1.0 / float(np.sqrt(HD))

    def run(q):
        ksx, vsx, bias = prepare_decode_attn_operands(k_s, v_s, mask)
        for _ in range(iters):
            out = decode_attn_quantcache(
                q, k_q, ksx, v_q, vsx, bias, k1q, k1s, k1q, k1s,
                num_heads=H, sm_scale=sm, layer=0, seq_tile=seq_tile)
            q = out.reshape(B, 1, H, HD).astype(jnp.bfloat16) * 0.5
        return q[0, 0, 0, 0]

    f = jax.jit(run)
    jax.block_until_ready(f(q0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(q0))
        best = min(best, time.perf_counter() - t0)
    per_call_us = best / iters * 1e6
    cache_bytes = B * S * kvH * (2 * HD + 2 * 4)
    gibps = cache_bytes / (best / iters) / 2**30
    return round(per_call_us, 2), round(gibps, 1)


def main():
    report = {"iters": ITERS, "rows": []}

    def row(name, B, S, kvH, H, seq_tile=0):
        eff_tile = seq_tile or _seq_tile(S, kvH, HD)
        us, gibps = time_chain(B, S, kvH, H, seq_tile)
        r = {"name": name, "B": B, "S": S, "kvH": kvH, "H": H,
             "seq_tile": eff_tile, "grid_steps": B * (S // eff_tile),
             "us_per_call": us, "eff_GiBps": gibps}
        print(r)
        report["rows"].append(r)

    # fixed-cost probe: almost no bytes -> time ~ launch overhead
    row("probe_tinyS", 8, 64, 4, 28)
    row("probe_tinyS_B64", 64, 64, 4, 28)

    # B sweep at LLaVA geometry (reproduces the round-3 fixed+linear fit)
    for B in (8, 16, 32):
        row(f"llava_B{B}", B, 704, 32, 32, seq_tile=64)

    # seq-tile sweep at Qwen geometry (the round-4 adaptive-tile change;
    # tiles must be 32-multiples dividing S, so 704 offers 32/64/352/704)
    for st in (32, 64, 352, 704):
        row(f"qwen_B64_tile{st}", 64, 704, 4, 28, seq_tile=st)

    # seq-tile sweep at LLaVA geometry (VMEM permitting)
    for st in (32, 64, 352):
        try:
            row(f"llava_B32_tile{st}", 32, 704, 32, 32, seq_tile=st)
        except Exception as e:  # VMEM overflow at big tiles is informative
            print(f"llava_B32_tile{st}: FAILED {type(e).__name__}")
            report["rows"].append(
                {"name": f"llava_B32_tile{st}", "failed": str(e)[:200]})

    out = os.environ.get("KOV_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()

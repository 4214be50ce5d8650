"""Benchmark: attention-guided warp throughput (the BASELINE headline).

Target (BASELINE.md): >10,000 warps/sec/chip at 336px, batch 128, on TPU
v5e. The benchmarked op is the full fused pipeline per image — attention
transform -> marginal profiles -> CDF -> inverse grid -> MXU
interpolation-matrix resample — jit-compiled once, batch-128 vmapped, 24×24
LLaVA-style attention driving a 336×336×3 float32 warp.

The resample core is the MXU interpolation-matrix matmul pair at HIGH
precision (3-pass bf16; ≤5e-5 of the exact path on [0,1] pixels, 20x inside
the ≤1e-3 parity budget — parity itself is enforced by the golden test suite
against cv2).

Methodology: K iterations run INSIDE one jit with the warp output feeding the
next iteration's input (a true sequential data dependency). This defeats XLA
dead-code/algebraic elimination and amortizes the dispatch pipeline of the
remote TPU tunnel, whose ``block_until_ready`` returns early for sub-ms
programs (verified by calibration against known matmul FLOPs).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "warps/sec/chip", "vs_baseline": N}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.warp import WarpParams, warp_batch_by_attention

BASELINE_WARPS_PER_SEC = 10_000.0
BATCH = 128
IMG = 336
ATT = 24
ITERS = 200


def main() -> int:
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, IMG, IMG, 3)), jnp.float32)
    atts = jnp.asarray(rng.random((BATCH, ATT, ATT)), jnp.float32)
    params = WarpParams()

    @jax.jit
    def chained(images, atts):
        def body(imgs, _):
            # the attention must depend on the carry too, otherwise XLA's
            # loop-invariant code motion hoists the transform->marginals->
            # CDF->grid stages out of the loop and the number measures
            # resample-only throughput
            atts_i = atts + imgs[0, 0, 0, 0] * 1e-20
            out = warp_batch_by_attention.__wrapped__(
                imgs, atts_i, IMG, IMG, params, "mm"
            )
            return out, None
        out, _ = jax.lax.scan(body, images, None, length=ITERS)
        return out

    # compile + warmup
    chained(images, atts).block_until_ready()

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        # fetch one element to force full completion across the tunnel
        float(chained(images, atts)[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)

    warps_per_sec = BATCH * ITERS / best
    print(
        json.dumps(
            {
                "metric": "attention_warp_throughput_336px_b128",
                "value": round(warps_per_sec, 1),
                "unit": "warps/sec/chip",
                "vs_baseline": round(warps_per_sec / BASELINE_WARPS_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

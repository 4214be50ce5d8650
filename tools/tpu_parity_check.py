"""On-device parity check: run the golden warp comparisons ON the TPU.

The pytest suite pins itself to CPU (conftest) so it can simulate an 8-device
mesh; this script re-runs the core parity assertions against the cv2/NumPy
oracle with the compute genuinely on the TPU chip — catching
device-specific issues like default-precision matmuls.

Usage:  PYTHONPATH=.:$PYTHONPATH python tools/tpu_parity_check.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    print("devices:", jax.devices())
    if jax.default_backend() == "cpu" and "--allow-cpu" not in sys.argv:
        print(
            "FAIL: running on CPU — this script exists to validate DEVICE "
            "precision (bf16 matmuls etc.); a CPU run passes trivially. "
            "Pass --allow-cpu to override."
        )
        return 1
    from attwarp_tpu.testing.oracle import (
        mota_mask_oracle,
        warp_from_cdf_oracle,
        warp_image_by_attention_oracle,
    )
    from attwarp_tpu.numerics import cdf_from_density
    from attwarp_tpu.warp import (
        Transform,
        WarpParams,
        mota_mask,
        warp_batch_by_attention,
        warp_from_cdf,
        warp_image_by_attention,
    )

    rng = np.random.default_rng(0)
    failures = 0

    def check(name, dev, budget):
        nonlocal failures
        status = "OK " if dev <= budget else "FAIL"
        if dev > budget:
            failures += 1
        print(f"  [{status}] {name}: max dev {dev:.2e} (budget {budget:.0e})")

    # C1 single warp, all transforms, [0,255] pixels -> budget 1e-3*255
    img = (rng.random((48, 48, 3)) * 255).astype(np.float32)
    att = (rng.random((48, 48)) * 255).astype(np.float32)
    print("C1 warp_image_by_attention vs oracle (on TPU):")
    for t in ["identity", "square", "sqrt", "exp", "log"]:
        ours = np.asarray(
            warp_image_by_attention(
                jnp.asarray(img), jnp.asarray(att), 48, 48,
                WarpParams(transform=Transform.from_name(t)),
            )
        )
        ref = warp_image_by_attention_oracle(img, att, 48, 48, transform=t)
        check(f"transform={t}", float(np.abs(ours - ref).max()), 1e-3 * 255)

    # C4 CDF warp
    B, H, W = 4, 37, 41
    imgs = (rng.random((B, H, W, 3)) * 255).astype(np.float32)
    Fx = np.asarray(cdf_from_density(jnp.asarray(rng.random((B, W)), jnp.float32)))
    Fy = np.asarray(cdf_from_density(jnp.asarray(rng.random((B, H)), jnp.float32)))
    ours = np.asarray(warp_from_cdf(jnp.asarray(imgs), jnp.asarray(Fx), jnp.asarray(Fy)))
    ref = warp_from_cdf_oracle(imgs, Fx, Fy)
    print("C4 warp_from_cdf vs oracle:")
    check("gather", float(np.abs(ours - ref).max()), 1e-3 * 255)

    # throughput paths vs gather bit-reference at bench shapes
    print("resample fast paths vs gather (B=32, 336px):")
    imgs336 = jnp.asarray(rng.random((32, 336, 336, 3)) * 255, jnp.float32)
    atts24 = jnp.asarray(rng.random((32, 24, 24)), jnp.float32)
    base = np.asarray(warp_batch_by_attention(imgs336, atts24, 336, 336, method="gather"))
    for m in ("mm", "mm_exact", "pallas"):
        out = np.asarray(warp_batch_by_attention(imgs336, atts24, 336, 336, method=m))
        check(f"method={m}", float(np.abs(out - base).max()), 1e-3 * 255)

    # C9 mota mask (uint8 levels); the oracle needs torch+PIL — report a
    # skip on hosts without them instead of dying mid-run
    try:
        att24 = rng.random((24, 24)).astype(np.float32)
        ours = np.asarray(mota_mask(jnp.asarray(att24), (64, 64)))
        ref = mota_mask_oracle(att24, (64, 64))
        dev = float(np.abs(ours.astype(int) - ref.astype(int)).max())
        check("C9 mota_mask (uint8 LSB)", dev, 1.0)
    except ImportError as e:
        print(f"  [SKIP] C9 mota_mask oracle needs torch/PIL: {e}")

    print("FAILURES:" if failures else "ALL PARITY CHECKS PASSED ON DEVICE", failures or "")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Split the flagship warp number into matmul vs non-matmul terms
(VERDICT r3 item 6: the 60%-of-MXU-peak figure was asserted, not profiled).

Terms at the headline shape (336px, b128, 24x24 attention, method="mm"):

  full       the benched pipeline (bench.py): transform -> marginals ->
             CDF -> inverse grid -> two interpolation-matrix matmuls
  grid       transform -> marginals -> CDF -> piecewise-linear inverse ->
             interp-matrix BUILD (everything before the image matmuls)
  resample   the two MXU matmul passes alone, maps held fixed

Same chained-iteration methodology as bench.py (CLAUDE.md relay rules).

Run:  PYTHONPATH=.:$PYTHONPATH python tools/profile_warp_terms.py [--img 336]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_utils  # noqa: F401
from attwarp_tpu.warp.grid import attention_profiles, inverse_axis_map
from attwarp_tpu.warp.resample import remap_bilinear_separable_mm
from attwarp_tpu.warp.transforms import WarpParams
from attwarp_tpu.warp.warp import warp_batch_by_attention

ap = argparse.ArgumentParser()
ap.add_argument("--img", type=int, default=336)
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--att", type=int, default=24)
ap.add_argument("--iters", type=int, default=200)
ap.add_argument("--out", default="")
args = ap.parse_args()

B, IMG, ATT, ITERS = args.batch, args.img, args.att, args.iters
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, IMG, IMG, 3)), jnp.float32)
atts = jnp.asarray(rng.random((B, ATT, ATT)), jnp.float32)
params = WarpParams()


def _fetch(out):
    # block_until_ready returns EARLY through the axon relay (CLAUDE.md);
    # fetching one element is the only true completion barrier (bench.py).
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def timed(fn, *arrs):
    f = jax.jit(fn)
    _fetch(f(*arrs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(f(*arrs))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS / B * 1e6       # us per image


def full_prog(images, atts):
    def body(imgs, _):
        atts_i = atts + imgs[0, 0, 0, 0] * 1e-20
        out = warp_batch_by_attention.__wrapped__(
            imgs, atts_i, IMG, IMG, params, "mm")
        return out, None
    out, _ = jax.lax.scan(body, images, None, length=ITERS)
    return out


def grid_prog(atts):
    # scale the attention-cell coordinates to image pixels like the
    # lowres-att path does (warp.py::_single_warp_lowres_att)
    def one(am):
        px, py, tx, ty = attention_profiles(am, params)
        mx = inverse_axis_map(px, tx, IMG) * (IMG / ATT)
        my = inverse_axis_map(py, ty, IMG) * (IMG / ATT)
        return mx, my

    def body(carry, _):
        atts_i = atts + carry * 1e-20
        mx, my = jax.vmap(one)(atts_i)
        return mx[0, 0] + my[0, 0], None

    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return out


def resample_prog(images, maps):
    mx, my = maps

    def body(imgs, _):
        out = jax.vmap(
            lambda im, a, b: remap_bilinear_separable_mm(im, a, b)
        )(imgs, mx + imgs[0, 0, 0, 0] * 1e-20, my)
        return out, None

    out, _ = jax.lax.scan(body, images, None, length=ITERS)
    return out


def one_map(am):
    px, py, tx, ty = attention_profiles(am, params)
    return (inverse_axis_map(px, tx, IMG) * (IMG / ATT),
            inverse_axis_map(py, ty, IMG) * (IMG / ATT))


maps = jax.jit(jax.vmap(one_map))(atts)

res = {
    "full_us_per_image": round(timed(full_prog, images, atts), 2),
    "grid_us_per_image": round(timed(grid_prog, atts), 2),
    "resample_us_per_image": round(timed(resample_prog, images, maps), 2),
}
res["shape"] = {"img": IMG, "batch": B, "att": ATT, "iters": ITERS}
res["full_warps_per_sec"] = round(1e6 / res["full_us_per_image"], 1)
res["sum_grid_plus_resample_us"] = round(
    res["grid_us_per_image"] + res["resample_us_per_image"], 2)
# MXU floor for the resample pair: 2 axes x 3 channels x 2*IMG^3 FLOP per
# matmul x 3 bf16 passes at 197 TFLOP/s bf16 (v5e)
flops = 2 * 3 * 2 * IMG**3 * 3
res["resample_mxu_floor_us"] = round(flops / 197e12 * 1e6, 2)
print(json.dumps(res, indent=2))
if args.out:
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)

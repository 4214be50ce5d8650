"""Quantitative demonstration of the AttWarp mechanism.

The paper's premise ("Constructive Distortion", arXiv:2510.09741): MLLMs
downsample images to a small input resolution (CLIP: 336px), destroying fine
detail; magnifying attended regions BEFORE the resize preserves exactly the
detail the question needs. The full accuracy claim needs real LLaVA weights
(unavailable in a zero-egress environment), but the mechanism is directly
measurable without any model:

1. Render a 2-D barcode (8x8 bits) into a small region of a large image.
2. Mark that region as attended.
3. Downsample to the MLLM input resolution with and without the
   attention-guided warp.
4. Decode the bits back from the downsampled images (locating the region
   through the known warp map).

The warped path decodes (near-)perfectly at input resolutions where the
unwarped path is at chance — the "more pixels on the answer" effect the VQA
gains come from.

Run: PYTHONPATH=.:$PYTHONPATH python examples/mechanism_demo.py
"""

from __future__ import annotations

import sys
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from attwarp_tpu.warp import WarpParams, warp_image_by_attention
from attwarp_tpu.warp.grid import attention_profiles, inverse_axis_map

SRC = 512           # source image resolution
REGION = 64         # barcode region side
POS = (96, 320)     # region top-left (y, x)
BITS = 8            # 8x8 barcode
BASE_ATT = 0.05     # background attention


def make_scene(rng) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(image, attention, code): a noisy photo-like image with a barcode."""
    img = (rng.random((SRC, SRC, 3)) * 80 + 80).astype(np.float32)
    code = rng.integers(0, 2, size=(BITS, BITS)).astype(np.float32)
    cell = REGION // BITS
    patch = np.kron(code, np.ones((cell, cell), np.float32)) * 255.0
    y, x = POS
    img[y : y + REGION, x : x + REGION] = patch[..., None]
    att = np.full((SRC, SRC), BASE_ATT, np.float32)
    att[y : y + REGION, x : x + REGION] = 1.0
    return img, att, code


def _axis_map(att: np.ndarray, out_len: int, axis: str) -> np.ndarray:
    """Forward pixel mapping for one axis: source index -> output coordinate
    (the inverse of the warp's inverse map, evaluated on the knots)."""
    px, py, tx, ty = attention_profiles(jnp.asarray(att), WarpParams())
    prof, tot = (px, tx) if axis == "x" else (py, ty)
    cum = np.concatenate([[0.0], np.cumsum(np.asarray(prof)) / float(tot)])
    return cum * out_len  # forward knots (source pixel i -> output coord)


def decode_bits(
    model_input: np.ndarray, region_box: Tuple[float, float, float, float]
) -> np.ndarray:
    """Crop the (possibly warped+resized) barcode region and threshold it
    back to BITS x BITS."""
    y0, y1, x0, x1 = region_box
    h, w = model_input.shape[:2]
    ys = np.clip(np.linspace(y0, y1, 8 * BITS, endpoint=False), 0, h - 1)
    xs = np.clip(np.linspace(x0, x1, 8 * BITS, endpoint=False), 0, w - 1)
    crop = model_input[np.rint(ys).astype(int)][:, np.rint(xs).astype(int)]
    gray = crop.mean(axis=-1)
    cells = gray.reshape(BITS, 8, BITS, 8).mean(axis=(1, 3))
    thr = (cells.max() + cells.min()) / 2.0
    return (cells > thr).astype(np.float32)


def run_demo(input_res: int, seed: int = 0) -> Dict[str, float]:
    rng = np.random.default_rng(seed)
    img, att, code = make_scene(rng)
    y, x = POS

    # baseline: straight resize to the MLLM input resolution
    base_in = np.asarray(
        jax.image.resize(jnp.asarray(img), (input_res, input_res, 3), "linear")
    )
    s = input_res / SRC
    base_box = (y * s, (y + REGION) * s, x * s, (x + REGION) * s)
    base_bits = decode_bits(base_in, base_box)

    # attwarp: warp at source res (attended region magnified), then resize
    warped = np.asarray(
        warp_image_by_attention(jnp.asarray(img), jnp.asarray(att), SRC, SRC)
    )
    warp_in = np.asarray(
        jax.image.resize(jnp.asarray(warped), (input_res, input_res, 3), "linear")
    )
    fx = _axis_map(att, SRC, "x")
    fy = _axis_map(att, SRC, "y")
    warp_box = (fy[y] * s, fy[y + REGION] * s, fx[x] * s, fx[x + REGION] * s)
    warp_bits = decode_bits(warp_in, warp_box)

    n = BITS * BITS
    magnif = (warp_box[1] - warp_box[0]) / (base_box[1] - base_box[0])
    return {
        "input_res": input_res,
        "baseline_bit_acc": float((base_bits == code).sum()) / n,
        "warped_bit_acc": float((warp_bits == code).sum()) / n,
        "region_magnification": float(magnif),
    }


def main() -> int:
    print(f"{'input_res':>10} {'baseline':>10} {'warped':>10} {'magnif':>8}")
    for res in (48, 64, 96, 128, 192):
        r = run_demo(res)
        print(
            f"{r['input_res']:>10} {r['baseline_bit_acc']:>10.3f} "
            f"{r['warped_bit_acc']:>10.3f} {r['region_magnification']:>8.2f}x"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

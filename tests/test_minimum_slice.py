"""The BASELINE "minimum end-to-end slice" as a test (SURVEY §7 step 2):
precomputed 24×24 attention .npy -> enhanced MOTA mask -> CDF warp grid ->
bilinear resample -> PNG out, compared against the reference path
(main.py:357 -> 520-533) via the torch/PIL/cv2 oracle."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from attwarp_tpu.warp import mota_mask, warp_image_by_attention
from attwarp_tpu.testing.oracle import (
    mota_mask_oracle,
    warp_image_by_attention_oracle,
)


def test_minimum_slice_end_to_end(rng, tmp_path):
    H, W = 120, 160
    img = (rng.random((H, W, 3)) * 255).astype(np.float32)
    att = rng.random((24, 24)).astype(np.float32)
    att[5:9, 14:20] += 3.0  # a hot region
    np.save(tmp_path / "att.npy", att)

    att_loaded = np.load(tmp_path / "att.npy")

    # framework path (device)
    mask = np.asarray(mota_mask(jnp.asarray(att_loaded), (H, W)))
    warped = np.asarray(
        warp_image_by_attention(
            jnp.asarray(img), jnp.asarray(mask.astype(np.float32)), 500, 500
        )
    )
    out8 = np.clip(np.rint(warped), 0, 255).astype(np.uint8)
    Image.fromarray(out8).save(tmp_path / "warped.png")

    # reference path (torch + PIL + cv2)
    mask_ref = mota_mask_oracle(att_loaded, (H, W))
    warped_ref = warp_image_by_attention_oracle(
        img, mask_ref.astype(np.float32), 500, 500
    )

    # mask parity at uint8 level
    assert np.max(np.abs(mask.astype(int) - mask_ref.astype(int))) <= 1
    # warp parity on the SAME mask: the BASELINE <=1e-3 (on [0,1]) bound
    warped_same = np.asarray(
        warp_image_by_attention(
            jnp.asarray(img), jnp.asarray(mask_ref.astype(np.float32)), 500, 500
        )
    )
    assert np.max(np.abs(warped_same - warped_ref)) <= 1e-3 * 255
    # end-to-end (including the 1-LSB mask drift through the warp)
    assert np.max(np.abs(warped - warped_ref)) <= 2.0
    # the warped artifact decodes back
    assert np.asarray(Image.open(tmp_path / "warped.png")).shape == (500, 500, 3)

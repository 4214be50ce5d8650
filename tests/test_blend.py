"""Mask pipeline (C9) golden tests vs torch+PIL reference ops."""

import numpy as np
import jax.numpy as jnp
import torch

from attwarp_tpu.warp.blend import (
    enhance,
    mota_mask,
    normalize_minmax,
    resize_lanczos,
    revise_mask,
)
from attwarp_tpu.testing.oracle import mota_mask_oracle


def test_normalize_and_enhance_match_torch(rng):
    m = rng.random((24, 24)).astype(np.float32)
    ours = np.asarray(enhance(normalize_minmax(jnp.asarray(m), "min"), 10.0))
    t = torch.from_numpy(m)
    t = (t - t.min()) / (t.max() - t.min())
    t = t - t.mean()
    t = t / t.std()
    ref = torch.sigmoid(t * 10).clamp(0, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_revise_mask_matches_torch(rng):
    import torch.nn.functional as TF

    m = rng.random((24, 24)).astype(np.float32)
    ours = np.asarray(revise_mask(jnp.asarray(m), kernel_size=3, enhance_coe=10.0))
    t = torch.from_numpy(m)
    t = (t - t.min()) / (t.max() - t.min())
    t = t - t.mean()
    t = t / t.std()
    t = torch.sigmoid(t * 10).clamp(0, 1)
    k = torch.ones(1, 1, 3, 3) / 9.0
    ref = TF.conv2d(TF.pad(t[None, None], (1, 1, 1, 1), mode="replicate"), k)[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_lanczos_resize_matches_pil(rng):
    """PIL uses 22-bit fixed-point coefficients on uint8; allow 1 LSB."""
    from PIL import Image

    m8 = (rng.random((24, 24)) * 255).astype(np.uint8)
    ours = np.asarray(resize_lanczos(jnp.asarray(m8, dtype=jnp.float32), (100, 140), uint8_mode=True))
    ref = np.array(Image.fromarray(m8, mode="L").resize((140, 100), Image.LANCZOS))
    assert np.max(np.abs(ours - ref)) <= 1.0


def test_lanczos_downscale_matches_pil(rng):
    from PIL import Image

    m8 = (rng.random((100, 80)) * 255).astype(np.uint8)
    ours = np.asarray(resize_lanczos(jnp.asarray(m8, dtype=jnp.float32), (24, 24), uint8_mode=True))
    ref = np.array(Image.fromarray(m8, mode="L").resize((24, 24), Image.LANCZOS))
    assert np.max(np.abs(ours - ref)) <= 1.0


def test_mota_mask_matches_reference_pipeline(rng):
    att = rng.random((24, 24)).astype(np.float32)
    ours = np.asarray(mota_mask(jnp.asarray(att), (64, 64), quantize_like_reference=True))
    ref = mota_mask_oracle(att, (64, 64))
    # two uint8 quantization points -> allow 1 LSB drift
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1
    # the overwhelming majority must be exact
    assert np.mean(ours == ref) > 0.97

"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest
import jax.numpy as jnp


def test_negative_coords_border_replicate_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    from attwarp_tpu.warp.resample import (
        remap_bilinear_2d,
        remap_bilinear_separable,
        remap_bilinear_separable_mm,
    )

    img = (rng.random((9, 11)) * 255).astype(np.float32)
    mx = np.array([-1.5, -0.5, -0.01, 0.3, 10.0, 11.5], np.float32)
    my = np.array([-0.7, 0.0, 8.2, 9.0], np.float32)
    gx, gy = np.meshgrid(mx, my)
    ref = cv2.remap(img, gx, gy, interpolation=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REPLICATE)
    for fn in (remap_bilinear_separable, remap_bilinear_separable_mm):
        ours = np.asarray(fn(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
        np.testing.assert_allclose(ours, ref, atol=1e-3, err_msg=fn.__name__)
    ours2d = np.asarray(
        remap_bilinear_2d(jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy))
    )
    np.testing.assert_allclose(ours2d, ref, atol=1e-3)


def test_conv_templates_all_modes():
    from attwarp_tpu.extract.prompts import build_prompt

    v0 = build_prompt("hi?", "llava_v0")
    assert "###Human: <image>\nhi?###Assistant:" in v0
    l2 = build_prompt("hi?", "llava_llama_2")
    assert l2.startswith("[INST] <<SYS>>") and l2.endswith("[/INST]")
    mpt = build_prompt("hi?", "mpt")
    assert "<|im_start|>user" in mpt and mpt.endswith("<|im_start|>assistant\n")
    v1 = build_prompt("hi?", "llava_v1")
    assert v1.endswith("ASSISTANT:") and "USER: <image>\nhi? ASSISTANT:" in v1


def test_mini_backend_prompt_overflow_raises(rng):
    from attwarp_tpu.extract.extraction import MiniLLaVABackend
    from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

    cfg = MiniLLaVAConfig(
        vocab=256, d_model=32, n_heads=2, n_layers=2, extract_layer=1,
        num_patches=4, image_size=32, max_seq=48,
    )
    be = MiniLLaVABackend(cfg)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    long_q = " ".join(f"word{i}" for i in range(60))
    with pytest.raises(ValueError, match="prompt too long"):
        be.extract(img, [long_q], max_new_tokens=4)


def test_constant_attention_mota_mask_finite():
    from attwarp_tpu.warp.blend import mota_mask

    att = jnp.full((24, 24), 0.5, jnp.float32)
    m = np.asarray(mota_mask(att, (48, 48)))
    assert np.isfinite(m.astype(np.float64)).all()
    # neutral: sigmoid(0)=0.5 -> ~127 everywhere after quantization
    assert 120 <= m.mean() <= 133


def test_eos_token_id_list_normalized():
    from attwarp_tpu.extract.llava_backend import _scalar_eos

    assert _scalar_eos([2, 32000]) == 2
    assert _scalar_eos(7) == 7
    assert _scalar_eos(None) == 2
    assert _scalar_eos([]) == 2


def test_dark_uint8_image_normalized_by_dtype(rng):
    from attwarp_tpu.extract.extraction import _resize_for_backend

    dark = np.zeros((16, 16, 3), np.uint8)
    dark[0, 0] = 1  # max()-heuristic would treat this as already-[0,1]
    out = _resize_for_backend(dark, 16)
    assert out.max() <= 1.5 / 255.0 + 1e-6
    bright_float = rng.random((16, 16, 3)).astype(np.float32) * 255.0
    out2 = _resize_for_backend(bright_float, 16)
    assert out2.max() <= 1.0 + 1e-5


def test_overlay_normalizes_after_resize(rng):
    from attwarp_tpu.warp.io import attention_overlay

    img = np.zeros((48, 48, 3), np.uint8)
    att = np.zeros((24, 24), np.float32)
    att[12, 12] = 10.0  # single hot cell: upsampling smooths the peak
    ov = attention_overlay(img, att, alpha=1.0)
    # normalizing AFTER the resize stretches to the full JET range: the
    # hottest pixel must hit the top colormap entry (pure-red region)
    from attwarp_tpu.utils.colormap import jet_lut_rgb

    top = jet_lut_rgb()[255]
    assert (ov.reshape(-1, 3) == top).any()


def test_resize_cubic_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    from attwarp_tpu.warp.blend import resize_cubic

    x = rng.random((16, 16)).astype(np.float32)
    for hw in [(48, 64), (9, 11)]:
        ours = np.asarray(resize_cubic(jnp.asarray(x), hw))
        ref = cv2.resize(x, (hw[1], hw[0]), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(ours, ref, atol=2e-5, err_msg=str(hw))


def test_pipeline_dark_uint8_image(rng):
    from attwarp_tpu.pipeline import _to_float255

    dark = np.zeros((8, 8, 3), np.uint8)
    dark[0, 0] = 1
    out = _to_float255(dark)
    assert out.max() == 1.0  # NOT rescaled to 255
    float01 = rng.random((8, 8, 3)).astype(np.float32)
    assert _to_float255(float01).max() <= 255.0 + 1e-3
    assert _to_float255(float01).max() > 1.5  # scaled up from [0,1]


def test_pipeline_mismatched_lengths_raise(rng):
    from attwarp_tpu.pipeline import AttWarpPipeline

    class _B:
        image_size = 16

        def extract(self, *a, **k):
            raise AssertionError("should not be reached")

    with pytest.raises(ValueError, match="questions"):
        AttWarpPipeline(_B()).run([np.zeros((8, 8, 3), np.uint8)], ["a", "b"])

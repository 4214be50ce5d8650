"""Layer sweep, iterative warp, profiling utils."""

import numpy as np
import jax.numpy as jnp

from attwarp_tpu.eval.ablation import am_all, interpret_bbox, top1
from attwarp_tpu.eval.layer_sweep import layer_sweep
from attwarp_tpu.warp.iterative import (
    condition_attention_map,
    gaussian_blur,
    iterative_warp,
)
from attwarp_tpu.utils.profiling import StageTimer


def test_bbox_metrics():
    att = np.zeros((10, 10))
    att[3, 7] = 5.0
    att[0, 0] = 1.0
    assert top1(att, (6, 2, 3, 3)) == 1      # argmax (r=3, c=7) inside x0=6..9, y0=2..5
    assert top1(att, (0, 0, 2, 2)) == 0
    am = am_all(att, (6, 2, 3, 3))
    assert abs(am - 5.0 / 6.0) < 1e-6
    assert interpret_bbox((1, 2, 5, 6), "xywh") == (1, 2, 5, 6)
    assert interpret_bbox((1, 2, 6, 8), "xyxy") == (1, 2, 5, 6)


def test_gaussian_blur_matches_cv2(rng):
    import pytest

    cv2 = pytest.importorskip("cv2")
    x = rng.random((40, 50)).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(x), 5, 1.0))
    ref = cv2.GaussianBlur(x, ksize=(5, 5), sigmaX=1.0, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_condition_attention_map(rng):
    att = rng.random((16, 20)).astype(np.float32)
    out = np.asarray(condition_attention_map(jnp.asarray(att), (64, 80)))
    assert out.shape == (64, 80)
    assert abs(out.min()) < 1e-6 and abs(out.max() - 1.0) < 1e-6


def test_iterative_warp_compounds(rng):
    img = (rng.random((40, 40, 3)) * 255).astype(np.float32)
    att = np.zeros((40, 40), np.float32)
    att[10:20, 10:20] = 1.0
    one = iterative_warp(jnp.asarray(img), jnp.asarray(att), 40, 40, iterations=1)
    three = iterative_warp(jnp.asarray(img), jnp.asarray(att), 40, 40, iterations=3)
    assert len(one) == 1 and len(three) == 3
    assert np.isfinite(np.asarray(three[-1])).all()
    # identity transform ignores exp_scale, so the first iterate matches the
    # single-pass result; further iterations keep compounding the warp
    np.testing.assert_allclose(np.asarray(three[0]), np.asarray(one[0]), atol=1e-4)
    assert np.abs(np.asarray(three[-1]) - np.asarray(one[0])).mean() > 1.0


def test_layer_sweep_with_mini_backend(rng, tmp_path):
    from attwarp_tpu.extract.extraction import MiniLLaVABackend
    from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

    cfg = MiniLLaVAConfig(
        vocab=256, d_model=32, n_heads=2, n_layers=2, extract_layer=1,
        num_patches=4, image_size=32, max_seq=96,
    )
    be = MiniLLaVABackend(cfg, seed=0)
    samples = [
        {
            "image": rng.random((32, 32, 3)).astype(np.float32),
            "question": "what is here?",
            "bbox": (0, 0, 16, 16),
        }
    ]
    summary = layer_sweep(be, samples, layers=[1], out_dir=str(tmp_path / "sweep"))
    assert "absolute/layer1" in summary and "relative/layer1" in summary
    assert (tmp_path / "sweep" / "results.csv").exists()
    assert (tmp_path / "sweep" / "summary.txt").exists()


def test_layer_sweep_uses_prefill_only_cadence(rng):
    """The sweep's maps must match the reference ablation cadence
    (uncertainty_attn_maps_llava.py:42 — ONE forward, single last-token
    attention row): identical to extract(max_new_tokens=0), and distinct
    from a prefill+decode average."""
    from attwarp_tpu.eval.layer_sweep import _extract_at_layer
    from attwarp_tpu.extract.extraction import MiniLLaVABackend
    from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

    cfg = MiniLLaVAConfig(
        vocab=256, d_model=32, n_heads=2, n_layers=2, extract_layer=1,
        num_patches=4, image_size=32, max_seq=96,
    )
    be = MiniLLaVABackend(cfg, seed=0)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    got = _extract_at_layer(be, img, ["what is here?"], 1)
    want, _ = be.extract(img, ["what is here?"], max_new_tokens=0)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)
    with_decode, _ = be.extract(img, ["what is here?"], max_new_tokens=2)
    assert np.abs(got - np.asarray(with_decode)).max() > 1e-6


def test_stage_timer(tmp_path):
    t = StageTimer(tmp_path / "stages.jsonl")
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert (tmp_path / "stages.jsonl").exists()

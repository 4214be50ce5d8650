"""Host-side warp IO (C3) and the generic JSONL driver input."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from attwarp_tpu.warp.io import (
    attention_overlay,
    coerce_att_map,
    next_run_dir,
    resize_image_to_match_attmap,
    save_warped_image,
)


def test_coerce_att_map_variants(rng):
    a2 = rng.random((10, 12)).astype(np.float32)
    np.testing.assert_array_equal(coerce_att_map(a2), a2)
    # 3-D -> channel mean
    a3 = rng.random((10, 12, 3)).astype(np.float32)
    np.testing.assert_allclose(coerce_att_map(a3), a3.mean(axis=2), atol=1e-6)
    # PIL input
    pil = Image.fromarray((a2 * 255).astype(np.uint8))
    assert coerce_att_map(pil).shape == (10, 12)
    # list -> first element; empty list -> default 128s
    np.testing.assert_array_equal(coerce_att_map([a2]), a2)
    d = coerce_att_map([], default_hw=(5, 7))
    assert d.shape == (5, 7) and np.all(d == 128)
    with pytest.raises(ValueError):
        coerce_att_map(rng.random((2, 3, 4, 5)))


def test_resize_to_attmap_and_overlay(rng):
    img = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
    att = rng.random((15, 20)).astype(np.float32)
    resized = resize_image_to_match_attmap(img, att)
    assert resized.shape == (15, 20, 3)
    ov = attention_overlay(img, att, alpha=0.4)
    assert ov.shape == img.shape and ov.dtype == np.uint8
    # constant attention -> zero-normalized heat, no crash
    ov2 = attention_overlay(img, np.ones((30, 40), np.float32))
    assert ov2.shape == img.shape


def test_save_warped_image_artifacts(rng, tmp_path):
    img_path = str(tmp_path / "in.png")
    Image.fromarray((rng.random((40, 50, 3)) * 255).astype(np.uint8)).save(img_path)
    att = rng.random((40, 50)).astype(np.float32)
    ok = save_warped_image(
        image_path=img_path,
        att_map=att,
        original_image_save_path=str(tmp_path / "orig.png"),
        masked_overlay_save_path=str(tmp_path / "overlay.png"),
        output_path=str(tmp_path / "warped.png"),
        vis_path=str(tmp_path / "vis.png"),
        width=60,
        height=45,
        transform="sqrt",
    )
    assert ok
    for f in ("orig.png", "overlay.png", "warped.png", "vis.png"):
        assert (tmp_path / f).exists(), f
    assert np.asarray(Image.open(tmp_path / "warped.png")).shape == (45, 60, 3)
    # failure path returns False instead of raising
    assert not save_warped_image(
        image_path=str(tmp_path / "missing.png"),
        att_map=att,
        original_image_save_path=None,
        masked_overlay_save_path=None,
        output_path=str(tmp_path / "x.png"),
    )


def test_next_run_dir(tmp_path):
    base = str(tmp_path / "runs")
    assert next_run_dir(base).endswith("run_0")
    assert next_run_dir(base).endswith("run_1")


def test_jsonl_driver(rng, tmp_path):
    from attwarp_tpu.cli.process_dataset import make_backend, process_dataset

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    jsonl = tmp_path / "data.jsonl"
    with open(jsonl, "w") as f:
        for i in range(2):
            p = str(imgs / f"g{i}.png")
            Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(p)
            f.write(json.dumps({"image_path": p, "question": f"what {i}?",
                                "answer": "x", "question_id": i}) + "\n")
    from attwarp_tpu.extract.extraction import MiniLLaVABackend
    from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

    be = MiniLLaVABackend(MiniLLaVAConfig(
        vocab=256, d_model=32, n_heads=2, n_layers=2, extract_layer=1,
        num_patches=4, image_size=32, max_seq=96,
    ))
    stats = process_dataset(
        None, None, str(tmp_path / "out"), be, jsonl=str(jsonl),
        batch_size=2, max_new_tokens=2, width=40, height=40,
    )
    assert stats == {"processed": 2, "failed": 0}
    metas = sorted(os.listdir(tmp_path / "out" / "metadata"))
    assert len(metas) == 2
    m = json.load(open(tmp_path / "out" / "metadata" / metas[0]))
    assert m["saved_paths"]["warped_image_identity"]

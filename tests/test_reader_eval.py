"""End-to-end accuracy-gain through the REAL driver + eval harness.

The committed artifact `eval_results/codetag_accuracy_gain.json` is produced
by this exact loop at n=50; here a small n keeps CI fast. Mirrors the
reference pair `main.py` → `evaluate_accuracy.py:275-473` with the
resolution-limited reader proxy standing in for the MLLM (no weights in this
environment)."""

import numpy as np

from attwarp_tpu.testing.reader import (
    ReaderBackend,
    bits_to_hex,
    make_scene,
    write_textvqa_dataset,
)


def test_bits_to_hex_roundtrip(rng):
    bits = rng.integers(0, 2, size=(8, 8))
    h = bits_to_hex(bits)
    assert len(h) == 16
    val = int(h, 16)
    flat = [(val >> (63 - i)) & 1 for i in range(64)]
    np.testing.assert_array_equal(np.asarray(flat).reshape(8, 8), bits)


def test_reader_cannot_resolve_unwarped_tag(rng):
    """The premise: at the reader's input resolution the tag is unreadable."""
    be = ReaderBackend()
    img, ans, _ = make_scene(rng)
    from attwarp_tpu.extract.extraction import _resize_for_backend

    _maps, texts = be.extract(
        _resize_for_backend(img, be.image_size)[None], ["q"]
    )
    assert texts[0] != ans


def test_reader_attention_lands_on_tag(rng):
    be = ReaderBackend()
    img, _ans, (y, x, side) = make_scene(rng)
    from attwarp_tpu.extract.extraction import _resize_for_backend

    maps, _ = be.extract(_resize_for_backend(img, be.image_size)[None], ["q"])
    n = be.num_patches_side
    iy, ix = np.unravel_index(np.argmax(maps[0]), maps[0].shape)
    scale = 512 / n
    assert y - scale <= iy * scale <= y + side + scale
    assert x - scale <= ix * scale <= x + side + scale


def test_end_to_end_accuracy_gain(tmp_path):
    """make dataset -> real driver -> real harness --score-original: the
    committed accuracy_gain > 0 must reproduce."""
    from attwarp_tpu.cli.process_dataset import make_backend, process_dataset
    from attwarp_tpu.eval.harness import (
        ExtractionAnswerBackend,
        evaluate_textvqa_accuracy,
    )

    json_path, image_dir = write_textvqa_dataset(str(tmp_path), n=6, seed=3)
    backend = make_backend("reader", 20)
    stats = process_dataset(
        json_path, image_dir, str(tmp_path / "processed"), backend,
        batch_size=6,
    )
    assert stats["processed"] == 6 and stats["failed"] == 0
    res = evaluate_textvqa_accuracy(
        str(tmp_path / "processed" / "metadata"),
        str(tmp_path / "eval"),
        ExtractionAnswerBackend(backend),
        score_original=True,
    )
    assert res["total_samples_evaluated"] == 6
    assert res["overall_original_accuracy"] <= 1 / 6  # unreadable unwarped
    assert res["overall_warped_accuracy"] >= 4 / 6
    assert res["accuracy_gain"] > 0

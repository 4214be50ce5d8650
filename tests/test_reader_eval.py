"""End-to-end accuracy-gain through the REAL driver + eval harness.

The committed artifact `eval_results/codetag_accuracy_gain.json` is produced
by this exact loop at n=50; here a small n keeps CI fast. Mirrors the
reference pair `main.py` → `evaluate_accuracy.py:275-473` with the
resolution-limited reader proxy standing in for the MLLM (no weights in this
environment)."""

import zlib

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

    # batched answering (batch_size>1 buffers + answer_many) must reproduce
    # the sequential run exactly — same scores, same per-sample records
    res_b = evaluate_textvqa_accuracy(
        str(tmp_path / "processed" / "metadata"),
        str(tmp_path / "eval_batched"),
        ExtractionAnswerBackend(backend),
        score_original=True,
        batch_size=4,
    )
    assert res_b["overall_warped_accuracy"] == res["overall_warped_accuracy"]
    assert res_b["accuracy_gain"] == res["accuracy_gain"]
    a = [(r["sample_id"], r["warped_answer"]) for r in res["detailed_results"]]
    b = [(r["sample_id"], r["warped_answer"]) for r in res_b["detailed_results"]]
    assert a == b


def test_engine_answer_backend_matches_extraction(tmp_path, rng):
    """EngineAnswerBackend (continuous-batching eval answering) produces the
    same answers as the per-sample extraction path on a real tiny LLaVA."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    from attwarp_tpu.extract.llava_backend import LlavaBackend
    from attwarp_tpu.models import LlavaModel, port_hf_llava_weights
    from attwarp_tpu.eval.harness import (
        EngineAnswerBackend,
        ExtractionAnswerBackend,
    )

    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(
        HFLlavaConfig(
            vision_config=CLIPVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14,
            ),
            text_config=HFLlamaConfig(
                vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2,
            ),
            image_token_index=99,
            vision_feature_layer=-2,
        )
    ).eval()
    cfg = LlavaBackend.config_from_hf(hf.config)

    class _WordTok:
        def __call__(self, text, add_special_tokens=False):
            # deterministic word hash: builtin hash() is salted per process
            # (PYTHONHASHSEED), and unlucky salts made the tiny random model
            # greedily emit EOS first for one prompt — a legitimately empty
            # answer that flaked the non-empty assertion below
            return {"input_ids": [3 + (zlib.crc32(w.encode()) % 90)
                                  for w in text.split()]}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    be = LlavaBackend(
        LlavaModel(cfg, port_hf_llava_weights(hf.state_dict(), cfg)),
        tokenizer=_WordTok(),
    )
    imgs = [rng.random((40, 44, 3)).astype(np.float32) for _ in range(4)]
    qs = ["what is shown here", "read the label", "what color is it",
          "how many objects"]
    seq = ExtractionAnswerBackend(be, max_new_tokens=4)
    eng = EngineAnswerBackend(be, slots=2, max_seq=96, max_new_tokens=4,
                              steps_per_tick=2)
    a = seq.answer_many(imgs, qs, 4)
    b = eng.answer_many(imgs, qs, 4)
    assert a == b, (a, b)
    assert eng.answer(imgs[0], qs[0], 4) == a[0]

    # an oversized prompt (beyond the engine's max_seq) must not fail the
    # chunk NOR be dropped from the eval denominator: it is routed through
    # the backend's plain batched decode and answered like the rest
    # (ADVICE round 2: the old path raised in submit, then again in the
    # per-sample fallback, silently skewing the denominator)
    long_q = "word " * 120 + "what does it say"
    mixed_qs = [qs[0], long_q, qs[2]]
    mixed_imgs = [imgs[0], imgs[1], imgs[2]]
    got = eng.answer_many(mixed_imgs, mixed_qs, 4)
    assert all(isinstance(x, str) and x for x in got), got
    assert got[0] == a[0] and got[2] == a[2]
    assert got[1] == seq.answer(imgs[1], long_q, 4)


def test_engine_answer_backend_lazy_sizing_and_retirement(rng):
    """The engine is built lazily, sized from the first chunk's ACTUAL
    tokenized prompts (the generous static cap cost ~1 MiB of dense KV per
    extra token per slot at 7B and pushed 16 slots past HBM), and a failed
    engine is retired — KV cache freed — with answering continuing through
    the plain batched decode instead of skipping samples."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    from attwarp_tpu.extract.llava_backend import LlavaBackend
    from attwarp_tpu.models import LlavaModel, port_hf_llava_weights
    from attwarp_tpu.eval.harness import (
        ANSWER_SUFFIX,
        EngineAnswerBackend,
        ExtractionAnswerBackend,
    )
    from attwarp_tpu.serving import ServeEngine

    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(
        HFLlavaConfig(
            vision_config=CLIPVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14,
            ),
            text_config=HFLlamaConfig(
                vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2,
            ),
            image_token_index=99,
            vision_feature_layer=-2,
        )
    ).eval()
    cfg = LlavaBackend.config_from_hf(hf.config)

    class _WordTok:
        def __call__(self, text, add_special_tokens=False):
            # deterministic (see _WordTok above)
            return {"input_ids": [3 + (zlib.crc32(w.encode()) % 90)
                                  for w in text.split()]}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{int(i)}" for i in ids)

    be = LlavaBackend(
        LlavaModel(cfg, port_hf_llava_weights(hf.state_dict(), cfg)),
        tokenizer=_WordTok(),
    )
    imgs = [rng.random((40, 44, 3)).astype(np.float32) for _ in range(3)]
    qs = ["what is shown", "read the label", "how many objects"]
    ref = ExtractionAnswerBackend(be, max_new_tokens=4).answer_many(imgs, qs, 4)

    # lazy sizing: no engine before the first chunk; afterwards max_seq is
    # the prompt bucket + max_new + tick, NOT the generous static cap
    eng = EngineAnswerBackend(be, slots=2, max_new_tokens=4, steps_per_tick=2)
    assert eng.engine is None
    assert eng.answer_many(imgs, qs, 4) == ref
    L = max(len(be.build_ids(q + ANSWER_SUFFIX)) for q in qs)
    assert eng.engine.max_seq == -(-L // 64) * 64 + 4 + 2

    # retirement: a failing engine frees its cache and answering proceeds
    # through the batched decode — same answers, nothing skipped
    def boom(self):
        raise RuntimeError("injected engine failure")

    real = ServeEngine.run
    ServeEngine.run = boom
    try:
        assert eng.answer_many(imgs, qs, 4) == ref
    finally:
        ServeEngine.run = real
    assert eng.engine is None and eng._engine_dead
    assert eng.answer_many(imgs, qs, 4) == ref     # stays on the batch path
    assert eng.answer(imgs[0], qs[0], 4) == ref[0]

    # halve-and-retry: at >= 8 slots a single failure rebuilds the engine
    # at half the slots (an OOM at an unlucky slot count usually fits at
    # half) and the SAME chunk still answers through the engine path
    eng2 = EngineAnswerBackend(be, slots=8, max_new_tokens=4,
                               steps_per_tick=2)
    calls = {"n": 0}

    def boom_once(self):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("injected engine failure")
        return real(self)

    ServeEngine.run = boom_once
    try:
        assert eng2.answer_many(imgs, qs, 4) == ref
    finally:
        ServeEngine.run = real
    assert eng2.engine is not None and not eng2._engine_dead
    assert eng2.engine.slots == 4 and eng2.slots == 4
    assert eng2.answer_many(imgs, qs, 4) == ref    # stays on the engine

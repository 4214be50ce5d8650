"""The two-pass AttWarp pipeline end to end with the mini backend."""

import numpy as np
import pytest

from attwarp_tpu.pipeline import AttWarpPipeline
from attwarp_tpu.warp.transforms import Transform


def _backend():
    from attwarp_tpu.extract.extraction import MiniLLaVABackend
    from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

    return MiniLLaVABackend(
        MiniLLaVAConfig(
            vocab=256, d_model=32, n_heads=2, n_layers=2, extract_layer=1,
            num_patches=4, image_size=32, max_seq=96,
        )
    )


def test_two_pass_pipeline(rng):
    pipe = AttWarpPipeline(_backend(), warp_size=64, max_new_tokens=2,
                           transform=Transform.SQRT, size_bucket=0)
    imgs = [
        (rng.random((40, 50, 3)) * 255).astype(np.uint8),
        (rng.random((30, 30, 3)) * 255).astype(np.uint8),
    ]
    res = pipe.run(imgs, ["what is left?", "what color?"])
    assert res.warped.shape == (2, 64, 64, 3)
    assert res.attention_maps.shape == (2, 4, 4)
    assert len(res.mota_masks) == 2
    assert res.mota_masks[0].shape == (40, 50)
    assert len(res.first_answers) == 2
    assert res.second_answers is not None and len(res.second_answers) == 2
    assert np.isfinite(res.warped).all()


def test_resize_images_batch_matches_host(rng):
    """Device-batched preprocessing is the same math as the per-image host
    resize, for every dtype convention and across shape groups."""
    from attwarp_tpu.extract.extraction import (
        _resize_for_backend,
        resize_images_batch,
    )

    imgs = [
        (rng.random((40, 50, 3)) * 255).astype(np.uint8),      # uint8
        rng.random((40, 50, 3)).astype(np.float32),            # float [0,1]
        (rng.random((24, 24, 3)) * 255).astype(np.float32),    # float 0-255
        (rng.random((40, 50, 3)) * 255).astype(np.uint8),      # group reuse
    ]
    got = np.asarray(resize_images_batch(imgs, 32))
    want = np.stack([_resize_for_backend(im, 32) for im in imgs])
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_pipeline_device_resident_matches_host(rng):
    """The device-resident flow (batched resizes, fused mask+warp, device
    pixels into pass 2) is answer- and pixel-identical to the host flow on
    a real LlavaBackend."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from tools.make_random_7b_ckpt import build_dry_run_tokenizer
    import torch
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    from attwarp_tpu.extract.llava_backend import LlavaBackend
    from attwarp_tpu.models import LlavaModel, port_hf_llava_weights

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
    params = port_hf_llava_weights(hf.state_dict(), cfg)
    be = LlavaBackend(LlavaModel(cfg, params), extract_layer=1,
                      tokenizer=build_dry_run_tokenizer())
    assert be.supports_device_pixels

    imgs = [
        (rng.random((40, 50, 3)) * 255).astype(np.uint8),
        rng.random((30, 30, 3)).astype(np.float32),
        (rng.random((40, 50, 3)) * 255).astype(np.uint8),
    ]
    qs = ["what is the text?", "read the label", "what is shown here?"]

    def mk(dev):
        return AttWarpPipeline(be, warp_size=32, max_new_tokens=3,
                               size_bucket=16, max_side=48,
                               device_resident=dev)

    host = mk(False).run(imgs, qs)
    dev = mk(True).run(imgs, qs)

    assert dev.first_answers == host.first_answers
    assert dev.second_answers == host.second_answers
    np.testing.assert_allclose(dev.attention_maps, host.attention_maps,
                               atol=1e-6)
    for m_dev, m_host in zip(dev.mota_masks, host.mota_masks):
        assert m_dev.shape == m_host.shape
        np.testing.assert_allclose(
            m_dev.astype(np.float32), m_host.astype(np.float32), atol=1.0
        )
    np.testing.assert_allclose(dev.warped, host.warped, atol=2e-3)


class _StubMultiLayerBackend:
    image_size = 32
    num_patches_side = 4
    extract_layer = (0, 1)
    name = "stub-multi"

    def extract(self, images, questions, max_new_tokens=20):
        B = len(images)
        maps = np.zeros((2, B, 4, 4), np.float32)
        maps[0, :, 1, 1] = 1.0
        maps[1] = 1.0 / 16
        return maps, ["a"] * B


def test_pipeline_multilayer_backend_uses_primary_layer(rng):
    """A multi-layer backend feeds the pipeline its FIRST listed layer."""
    pipe = AttWarpPipeline(_StubMultiLayerBackend(), warp_size=32,
                           second_pass=False, max_new_tokens=1, size_bucket=0)
    res = pipe.run([(rng.random((32, 32, 3)) * 255).astype(np.uint8)], ["q?"])
    assert res.attention_maps.shape == (1, 4, 4)
    assert res.attention_maps[0, 1, 1] == 1.0  # layer 0, not the uniform one
    assert res.warped.shape == (1, 32, 32, 3)


def test_pipeline_no_second_pass(rng):
    pipe = AttWarpPipeline(_backend(), warp_size=48, second_pass=False,
                           max_new_tokens=2)
    res = pipe.run([(rng.random((32, 32, 3)) * 255).astype(np.uint8)], ["q?"])
    assert res.second_answers is None
    assert res.warped.shape == (1, 48, 48, 3)


def test_pipeline_size_bucketing(rng):
    """Odd native sizes snap up to the bucket so compiled warp shapes stay
    bounded; identical buckets share one group."""
    pipe = AttWarpPipeline(_backend(), warp_size=32, second_pass=False,
                           max_new_tokens=2, size_bucket=16, max_side=64)
    imgs = [
        (rng.random((33, 47, 3)) * 255).astype(np.uint8),   # -> (48, 48)
        (rng.random((41, 48, 3)) * 255).astype(np.uint8),   # -> (48, 48)
        (rng.random((100, 20, 3)) * 255).astype(np.uint8),  # -> (64, 32) capped
    ]
    res = pipe.run(imgs, ["a", "b", "c"])
    assert res.mota_masks[0].shape == (48, 48)
    assert res.mota_masks[1].shape == (48, 48)
    assert res.mota_masks[2].shape == (64, 32)
    assert res.warped.shape == (3, 32, 32, 3)
    assert np.isfinite(res.warped).all()


def test_pipeline_second_pass_uses_answer_fast_path(rng):
    """Backends with answer_batch get the answer-only second pass; the
    answers must equal the extract-path texts (same greedy decode)."""
    import numpy as np

    class _Spy:
        """Wrap the mini backend; expose answer_batch that mirrors extract's
        texts and record which path the pipeline took."""

        def __init__(self):
            self.inner = _backend()
            self.image_size = self.inner.image_size
            self.calls = []

        def extract(self, images, questions, max_new_tokens=20):
            self.calls.append("extract")
            return self.inner.extract(images, questions, max_new_tokens)

        def answer_batch(self, images, questions, max_new_tokens=20):
            self.calls.append("answer_batch")
            _m, texts = self.inner.extract(images, questions, max_new_tokens)
            return texts

    spy = _Spy()
    pipe = AttWarpPipeline(spy, warp_size=48, max_new_tokens=2, size_bucket=0)
    imgs = [np.asarray(rng.random((40, 40, 3)) * 255, np.uint8)]
    res = pipe.run(imgs, ["what is it?"])
    # pass 1 extracted; pass 2 took the fast path
    assert spy.calls[0] == "extract" and "answer_batch" in spy.calls
    assert res.second_answers is not None and len(res.second_answers) == 1

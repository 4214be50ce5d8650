"""Qwen2VLBackend ids-level extraction over the tiny ported model."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from attwarp_tpu.extract.qwen2vl_backend import Qwen2VLBackend
from attwarp_tpu.models.qwen2vl import Qwen2VLModel, port_hf_qwen2vl_weights

IMG_TOKEN = 97
VSTART = 96


@pytest.fixture(scope="module")
def backend():
    from transformers import (
        Qwen2VLConfig as HFQwen2VLConfig,
        Qwen2VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(
        HFQwen2VLConfig(
            text_config=dict(
                vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, rope_theta=10000.0,
                rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
                max_position_embeddings=512,
            ),
            vision_config=dict(
                depth=2, embed_dim=32, hidden_size=48, num_heads=2,
                patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
                mlp_ratio=2, hidden_act="quick_gelu",
            ),
            image_token_id=IMG_TOKEN,
            video_token_id=98,
            vision_start_token_id=VSTART,
        )
    ).eval()
    cfg = Qwen2VLBackend.config_from_hf(hf.config)
    params = port_hf_qwen2vl_weights(hf.state_dict(), cfg)
    return Qwen2VLBackend(
        Qwen2VLModel(cfg, params), extract_layer=1, image_size=56
    )


def test_extract_from_ids(backend, rng):
    n_tok = backend.num_patches_side ** 2
    assert n_tok == 4
    ids = rng.integers(3, 90, size=(2, 8 + n_tok)).astype(np.int64)
    ids[:, 1] = VSTART
    ids[:, 2 : 2 + n_tok] = IMG_TOKEN
    mask = np.ones_like(ids)
    img = rng.standard_normal((56, 56, 3)).astype(np.float32)
    gen, maps = backend.extract_from_ids(ids, mask, img, max_new_tokens=3)
    assert gen.shape == (2, 3)
    assert maps.shape == (2, 2, 2)
    assert np.isfinite(maps).all() and (maps >= 0).all()
    np.testing.assert_allclose(maps.reshape(2, -1).sum(-1), 1.0, atol=1e-5)


def test_extract_from_ids_batched_images(backend, rng):
    """Per-sample (B, S, S, 3) images in ONE batched call must match the
    per-sample B=1 calls (the vmapped vision tower path)."""
    n_tok = backend.num_patches_side ** 2
    ids = rng.integers(3, 90, size=(2, 8 + n_tok)).astype(np.int64)
    ids[:, 1] = VSTART
    ids[:, 2 : 2 + n_tok] = IMG_TOKEN
    mask = np.ones_like(ids)
    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)

    gen_b, maps_b = backend.extract_from_ids(ids, mask, imgs, max_new_tokens=3)
    for b in range(2):
        gen_1, maps_1 = backend.extract_from_ids(
            ids[b : b + 1], mask[b : b + 1], imgs[b], max_new_tokens=3
        )
        np.testing.assert_array_equal(gen_b[b], gen_1[0])
        np.testing.assert_allclose(maps_b[b], maps_1[0], atol=1e-5)


def test_backend_grid_assertion():
    import dataclasses

    from attwarp_tpu.models.qwen2vl import Qwen2VLConfig

    with pytest.raises(AssertionError):
        Qwen2VLBackend(
            Qwen2VLModel(Qwen2VLConfig(), {}), image_size=100  # not /28
        )


def test_qwen_tp_sharded_generate_matches(backend, rng):
    import jax

    from attwarp_tpu.models.qwen2vl import Qwen2VLModel, patchify_image
    from attwarp_tpu.parallel import make_mesh
    from attwarp_tpu.parallel.llava_sharding import shard_qwen2vl_params

    assert len(jax.devices()) >= 8
    model = backend.model
    n_tok = 4
    ids = rng.integers(3, 90, size=(2, 9 + n_tok)).astype(np.int64)
    ids[:, 1] = VSTART
    ids[:, 2 : 2 + n_tok] = IMG_TOKEN
    mask = np.ones_like(ids)
    img = rng.standard_normal((56, 56, 3)).astype(np.float32)
    patches, grid = patchify_image(img, model.cfg.vision)

    gen_ref, maps_ref = model.generate_with_attention(
        ids, patches, grid, mask, extract_layer=1, max_new_tokens=3
    )
    mesh = make_mesh(n_data=4, n_model=2)
    tp = Qwen2VLModel(model.cfg, shard_qwen2vl_params(model.params, mesh))
    gen_tp, maps_tp = tp.generate_with_attention(
        ids, patches, grid, mask, extract_layer=1, max_new_tokens=3
    )
    np.testing.assert_array_equal(np.asarray(gen_tp), np.asarray(gen_ref))
    np.testing.assert_allclose(np.asarray(maps_tp), np.asarray(maps_ref), atol=1e-5)


def test_qwen_feature_extractor(backend, rng):
    from attwarp_tpu.extract.features import Qwen2VLFeatureExtractor

    fx = Qwen2VLFeatureExtractor(backend)
    imgs = rng.random((2, 40, 44, 3)).astype(np.float32)
    toks = fx.visual_tokens(imgs)
    n = backend.num_patches_side
    assert toks.shape == (2, n, n, backend.model.cfg.vision.hidden_size)
    assert np.isfinite(np.asarray(toks)).all()
    with pytest.raises(RuntimeError, match="tokenizer"):
        fx.text_tokens(["q"])


def test_qwen_multilayer_extract_matches_single(backend, rng):
    n_tok = 4
    ids = rng.integers(3, 90, size=(2, 8 + n_tok)).astype(np.int64)
    ids[:, 1] = VSTART
    ids[:, 2 : 2 + n_tok] = IMG_TOKEN
    mask = np.ones_like(ids)
    img = rng.standard_normal((56, 56, 3)).astype(np.float32)

    old = backend.extract_layer
    try:
        backend.extract_layer = (1, 0)
        gen_m, maps_m = backend.extract_from_ids(ids, mask, img, max_new_tokens=3)
    finally:
        backend.extract_layer = old
    assert maps_m.shape == (2, 2, 2, 2)  # (L, B, h, w)

    for j, layer in enumerate((1, 0)):
        try:
            backend.extract_layer = layer
            gen_1, maps_1 = backend.extract_from_ids(ids, mask, img, max_new_tokens=3)
        finally:
            backend.extract_layer = old
        np.testing.assert_array_equal(gen_m, gen_1)
        np.testing.assert_allclose(maps_m[j], maps_1, atol=1e-6)


def test_qwen_int8_extract(backend, rng):
    """int8-quantized decoder runs the full extraction and stays close to fp."""
    from attwarp_tpu.models.qwen2vl import Qwen2VLModel
    from attwarp_tpu.numerics.quant import quantize_decoder_params

    params = dict(backend.model.params)
    params["text"] = quantize_decoder_params(params["text"])
    qbe = Qwen2VLBackend(Qwen2VLModel(backend.model.cfg, params),
                         extract_layer=1, image_size=56)

    n_tok = 4
    ids = rng.integers(3, 90, size=(2, 8 + n_tok)).astype(np.int64)
    ids[:, 1] = VSTART
    ids[:, 2 : 2 + n_tok] = IMG_TOKEN
    mask = np.ones_like(ids)
    img = rng.standard_normal((56, 56, 3)).astype(np.float32)

    gen_f, maps_f = backend.extract_from_ids(ids, mask, img, max_new_tokens=3)
    gen_q, maps_q = qbe.extract_from_ids(ids, mask, img, max_new_tokens=3)
    assert gen_q.shape == gen_f.shape and maps_q.shape == maps_f.shape
    assert np.isfinite(maps_q).all() and (maps_q >= 0).all()
    np.testing.assert_allclose(maps_q.reshape(2, -1).sum(-1), 1.0, atol=1e-4)
    a, b = maps_f.ravel(), maps_q.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, cos


class _WordTok:
    """Hash-words-to-ids stub tokenizer for text-level tests."""

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [3 + (hash(w) % 90) for w in text.split()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(i)}" for i in ids)


def test_qwen_answer_batch_matches_extract_texts(backend, rng):
    """Answer-only fast path (extract_layer=None) produces the same greedy
    text as the full extraction path."""
    old_tok = backend.tokenizer
    backend.tokenizer = _WordTok()
    try:
        imgs = rng.random((2, 56, 56, 3)).astype(np.float32)
        qs = ["what is shown", "read the sign"]
        _maps, texts = backend.extract(imgs, qs, max_new_tokens=3)
        fast = backend.answer_batch(imgs, qs, max_new_tokens=3)
        assert fast == texts
    finally:
        backend.tokenizer = old_tok


def test_qwen_kv8_extract(backend, rng):
    """int8 KV cache on the Qwen decoder: same contract, maps close to the
    dense-cache run, first token (prefill-exact) identical."""
    kvbe = Qwen2VLBackend(backend.model, extract_layer=1, image_size=56,
                          kv_quant=True)
    n_tok = 4
    ids = rng.integers(3, 90, size=(2, 8 + n_tok)).astype(np.int64)
    ids[:, 1] = VSTART
    ids[:, 2 : 2 + n_tok] = IMG_TOKEN
    mask = np.ones_like(ids)
    img = rng.standard_normal((56, 56, 3)).astype(np.float32)

    gen_f, maps_f = backend.extract_from_ids(ids, mask, img, max_new_tokens=3)
    gen_q, maps_q = kvbe.extract_from_ids(ids, mask, img, max_new_tokens=3)
    assert gen_q.shape == gen_f.shape and maps_q.shape == maps_f.shape
    np.testing.assert_array_equal(gen_q[:, 0], gen_f[:, 0])
    np.testing.assert_allclose(maps_q.reshape(2, -1).sum(-1), 1.0, atol=1e-4)
    a, b = maps_f.ravel(), maps_q.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_qwen_save_load_roundtrip(backend, rng, tmp_path):
    import jax

    backend.save(tmp_path / "ckpt")
    restored = Qwen2VLBackend.load(
        tmp_path / "ckpt", extract_layer=1, image_size=56
    )
    a = jax.tree_util.tree_leaves(backend.model.params)
    b = jax.tree_util.tree_leaves(restored.model.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert restored.model.cfg == backend.model.cfg

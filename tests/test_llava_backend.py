"""LlavaBackend ids-level extraction over the tiny ported model."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from attwarp_tpu.extract.llava_backend import LlavaBackend

IMG_TOKEN = 99


@pytest.fixture(scope="module")
def backend():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    from attwarp_tpu.models import LlavaModel, port_hf_llava_weights

    torch.manual_seed(0)
    hf_cfg = HFLlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text_config=HFLlamaConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        ),
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-2,
    )
    hf = LlavaForConditionalGeneration(hf_cfg).eval()
    cfg = LlavaBackend.config_from_hf(hf.config)
    params = port_hf_llava_weights(hf.state_dict(), cfg)
    return LlavaBackend(LlavaModel(cfg, params), extract_layer=1)


def test_extract_from_ids(backend, rng):
    B, n_img = 2, 4
    ids = rng.integers(3, 90, size=(B, 12)).astype(np.int64)
    ids[:, 2 : 2 + n_img] = IMG_TOKEN
    mask = np.ones_like(ids)
    pixels = rng.standard_normal((B, 28, 28, 3)).astype(np.float32)
    gen, maps = backend.extract_from_ids(ids, mask, pixels, max_new_tokens=4)
    assert gen.shape == (2, 4)
    assert maps.shape == (2, 2, 2)
    assert np.isfinite(maps).all() and (maps >= 0).all()
    np.testing.assert_allclose(maps.reshape(2, -1).sum(-1), 1.0, atol=1e-5)


def test_multilayer_extract_matches_single(backend, rng):
    """A tuple extract_layer yields per-layer maps (L, B, n, n) in ONE pass,
    identical to running the single-layer extraction once per layer (the
    reference's multilayer training data needs exactly this)."""
    B, n_img = 2, 4
    ids = rng.integers(3, 90, size=(B, 12)).astype(np.int64)
    ids[:, 2 : 2 + n_img] = IMG_TOKEN
    mask = np.ones_like(ids)
    pixels = rng.standard_normal((B, 28, 28, 3)).astype(np.float32)

    old = backend.extract_layer
    try:
        backend.extract_layer = (0, 2, 1)  # order must be respected
        gen_m, maps_m = backend.extract_from_ids(ids, mask, pixels, 3)
    finally:
        backend.extract_layer = old
    assert maps_m.shape == (3, B, 2, 2)

    for j, layer in enumerate((0, 2, 1)):
        try:
            backend.extract_layer = layer
            gen_1, maps_1 = backend.extract_from_ids(ids, mask, pixels, 3)
        finally:
            backend.extract_layer = old
        np.testing.assert_array_equal(gen_m, gen_1)  # decode unaffected
        np.testing.assert_allclose(maps_m[j], maps_1, atol=1e-6)


class _WordTok:
    """Hash-words-to-ids stub tokenizer for text-level tests."""

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [3 + (hash(w) % 90) for w in text.split()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(i)}" for i in ids)


def test_layer_sweep_fast_path_matches_fallback(backend, rng):
    """The sweep's one-pass multi-layer extraction returns the same per-layer
    maps as the per-layer fallback."""
    from attwarp_tpu.eval.layer_sweep import _extract_all_layers, _extract_at_layer

    old_tok = backend.tokenizer
    backend.tokenizer = _WordTok()
    try:
        imgs = rng.random((1, 28, 28, 3)).astype(np.float32)
        qs = ["what is shown"]
        layers = [0, 2]
        fast = _extract_all_layers(backend, imgs, qs, layers)
        assert fast is not None and set(fast) == {0, 2}
        for L in layers:
            slow = _extract_at_layer(backend, imgs, qs, L)
            np.testing.assert_allclose(fast[L], slow, atol=1e-6)
        assert backend.extract_layer == 1  # restored
    finally:
        backend.tokenizer = old_tok


def test_answer_batch_matches_extract_texts(backend, rng):
    """The answer-only fast path (extract_layer=None, no accumulator) must
    produce the same greedy text as the full extraction path — same decode,
    minus the attention work the eval harness doesn't need."""
    old_tok = backend.tokenizer
    backend.tokenizer = _WordTok()
    try:
        imgs = rng.random((2, 28, 28, 3)).astype(np.float32)
        qs = ["what is shown", "read the small text"]
        _maps, texts = backend.extract(imgs, qs, max_new_tokens=4)
        fast = backend.answer_batch(imgs, qs, max_new_tokens=4)
        assert fast == texts
    finally:
        backend.tokenizer = old_tok


def test_llava_int8_extract(backend, rng):
    """int8-quantized LLaMA decoder runs extraction end to end, close to fp."""
    from attwarp_tpu.models import LlavaModel
    from attwarp_tpu.numerics.quant import quantize_decoder_params

    params = dict(backend.model.params)
    params["llama"] = quantize_decoder_params(params["llama"])
    qbe = LlavaBackend(LlavaModel(backend.model.cfg, params), extract_layer=1)

    B, n_img = 2, 4
    ids = rng.integers(3, 90, size=(B, 12)).astype(np.int64)
    ids[:, 2 : 2 + n_img] = IMG_TOKEN
    mask = np.ones_like(ids)
    pixels = rng.standard_normal((B, 28, 28, 3)).astype(np.float32)
    gen_f, maps_f = backend.extract_from_ids(ids, mask, pixels, max_new_tokens=4)
    gen_q, maps_q = qbe.extract_from_ids(ids, mask, pixels, max_new_tokens=4)
    assert gen_q.shape == gen_f.shape and maps_q.shape == maps_f.shape
    assert np.isfinite(maps_q).all() and (maps_q >= 0).all()
    np.testing.assert_allclose(maps_q.reshape(2, -1).sum(-1), 1.0, atol=1e-4)
    a, b = maps_f.ravel(), maps_q.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, cos


def test_llava_kv8_extract(backend, rng):
    """int8 KV cache: same shapes/contract, maps close to the dense-cache
    run (the quantization error only enters through decode-step history)."""
    from attwarp_tpu.extract.llava_backend import LlavaBackend

    kvbe = LlavaBackend(backend.model, extract_layer=1, kv_quant=True)
    B, n_img = 2, 4
    ids = rng.integers(3, 90, size=(B, 12)).astype(np.int64)
    ids[:, 2 : 2 + n_img] = IMG_TOKEN
    mask = np.ones_like(ids)
    pixels = rng.standard_normal((B, 28, 28, 3)).astype(np.float32)
    gen_f, maps_f = backend.extract_from_ids(ids, mask, pixels, max_new_tokens=4)
    gen_q, maps_q = kvbe.extract_from_ids(ids, mask, pixels, max_new_tokens=4)
    assert gen_q.shape == gen_f.shape and maps_q.shape == maps_f.shape
    # the first generated token comes straight off the (exact) prefill
    np.testing.assert_array_equal(gen_q[:, 0], gen_f[:, 0])
    np.testing.assert_allclose(maps_q.reshape(B, -1).sum(-1), 1.0, atol=1e-4)
    a, b = maps_f.ravel(), maps_q.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_kv8_cli_suffix(backend, rng, tmp_path):
    """'+kv8' flips kv_quant; composes with '+int8'; mini backend rejects."""
    import pytest as _pytest

    from attwarp_tpu.cli.process_dataset import make_backend

    backend.save(tmp_path / "ckpt")
    be = make_backend(f"llava-ckpt:{tmp_path / 'ckpt'}+kv8", layer_index=1)
    assert be.kv_quant is True
    both = make_backend(f"llava-ckpt:{tmp_path / 'ckpt'}+int8+kv8", layer_index=1)
    assert both.kv_quant is True
    import jax.numpy as jnp
    assert both.model.params["llama"]["layers"][0]["q_proj"]["q"].dtype == jnp.int8
    ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
    ids[:, 1:5] = IMG_TOKEN
    pixels = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    g, m = both.extract_from_ids(ids, np.ones_like(ids), pixels, 3)
    assert g.shape == (1, 3) and np.isfinite(m).all()
    with _pytest.raises(ValueError, match="KV-cache"):
        make_backend("mini+kv8", layer_index=1)


def test_config_from_hf_roundtrip(backend):
    cfg = backend.model.cfg
    assert cfg.vision.num_patches == 4
    assert cfg.text.kv_heads == 2
    assert cfg.image_token_index == IMG_TOKEN
    assert backend.num_patches_side == 2


def test_backend_save_load_roundtrip(backend, rng, tmp_path):
    import jax
    import numpy as np

    from attwarp_tpu.extract.llava_backend import LlavaBackend

    backend.save(tmp_path / "ckpt")
    restored = LlavaBackend.load(tmp_path / "ckpt", extract_layer=1)
    a = jax.tree_util.tree_leaves(backend.model.params)
    b = jax.tree_util.tree_leaves(restored.model.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert restored.model.cfg == backend.model.cfg

    ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
    ids[:, 1:5] = IMG_TOKEN
    pixels = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)
    g1, m1 = backend.extract_from_ids(ids, np.ones_like(ids), pixels, 3)
    g2, m2 = restored.extract_from_ids(ids, np.ones_like(ids), pixels, 3)
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_allclose(m1, m2, atol=1e-6)

    # CLI routing: "+int8" suffix loads the checkpoint and quantizes in place
    import jax.numpy as jnp

    from attwarp_tpu.cli.process_dataset import make_backend

    q = make_backend(f"llava-ckpt:{tmp_path / 'ckpt'}+int8", layer_index=1)
    assert q.model.params["llama"]["layers"][0]["q_proj"]["q"].dtype == jnp.int8
    gq, mq = q.extract_from_ids(ids, np.ones_like(ids), pixels, 3)
    assert gq.shape == g1.shape and np.isfinite(mq).all()
    with pytest.raises(ValueError, match="int8"):
        make_backend("mini+int8", layer_index=1)

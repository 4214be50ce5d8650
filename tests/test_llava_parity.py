"""Numerical parity of the JAX LLaVA against HuggingFace transformers.

A tiny randomly-initialized ``LlavaForConditionalGeneration`` is built on
CPU torch, its weights ported with ``port_hf_llava_weights``, and logits +
extract-layer attention rows compared. This proves the real 7B checkpoint
would load and run identically (same architecture, same key layout).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from attwarp_tpu.models import (
    ClipVisionConfig,
    LlamaConfig,
    LlavaConfig,
    LlavaModel,
    port_hf_llava_weights,
)

IMG_TOKEN = 99


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(0)
    vision_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=32,
    )
    text_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
    )
    hf_cfg = HFLlavaConfig(
        vision_config=vision_cfg,
        text_config=text_cfg,
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    hf = LlavaForConditionalGeneration(hf_cfg).eval()
    hf.config._attn_implementation = "eager"

    cfg = LlavaConfig(
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text=LlamaConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        ),
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-2,
    )
    params = port_hf_llava_weights(hf.state_dict(), cfg)
    return hf, LlavaModel(cfg, params)


def _make_inputs(rng, B=2, n_img=4, n_txt=7):
    pixels = rng.standard_normal((B, 3, 28, 28)).astype(np.float32)
    ids = rng.integers(3, 90, size=(B, n_img + n_txt)).astype(np.int64)
    ids[:, 1 : 1 + n_img] = IMG_TOKEN
    return ids, pixels


def test_logits_match(tiny_pair, rng):
    hf, ours = tiny_pair
    ids, pixels = _make_inputs(rng)
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
        )
    ref = out.logits[:, -1, :].numpy()
    got, _ = ours.forward_logits(
        jnp.asarray(ids), jnp.moveaxis(jnp.asarray(pixels), 1, -1)
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)


def test_attention_row_matches(tiny_pair, rng):
    hf, ours = tiny_pair
    ids, pixels = _make_inputs(rng)
    layer = 1
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
            output_attentions=True,
        )
    ref_row = out.attentions[layer][:, :, -1, :].numpy()  # (B, H, T)
    _, row = ours.forward_logits(
        jnp.asarray(ids), jnp.moveaxis(jnp.asarray(pixels), 1, -1),
        extract_layer=layer,
    )
    np.testing.assert_allclose(np.asarray(row), ref_row, atol=2e-5)


def test_left_padded_logits_match(tiny_pair, rng):
    hf, ours = tiny_pair
    ids, pixels = _make_inputs(rng, B=2)
    # left-pad sample 1 by 3 tokens
    pad = 3
    ids_p = np.concatenate([np.zeros((2, pad), np.int64), ids], axis=1)
    mask = np.ones_like(ids_p)
    mask[1, :pad] = 0
    ids_p[1, :pad] = 0
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids_p),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.from_numpy(mask),
        )
    ref = out.logits[:, -1, :].numpy()
    got, _ = ours.forward_logits(
        jnp.asarray(ids_p),
        jnp.moveaxis(jnp.asarray(pixels), 1, -1),
        attention_mask=jnp.asarray(mask, bool),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)


def test_greedy_generation_matches_hf(tiny_pair, rng):
    hf, ours = tiny_pair
    ids, pixels = _make_inputs(rng)
    K = 5
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
            do_sample=False,
            max_new_tokens=K,
            use_cache=True,
        )
    ref_new = gen[:, ids.shape[1]:].numpy()
    our_ids, maps = ours.generate_with_attention(
        jnp.asarray(ids),
        jnp.moveaxis(jnp.asarray(pixels), 1, -1),
        jnp.ones(ids.shape, bool),
        img_start=jnp.asarray([1, 1], jnp.int32),
        extract_layer=1,
        max_new_tokens=K,
    )
    np.testing.assert_array_equal(np.asarray(our_ids), ref_new)
    assert maps.shape == (2, 2, 2)
    np.testing.assert_allclose(np.asarray(maps).reshape(2, -1).sum(-1), 1.0, atol=1e-5)

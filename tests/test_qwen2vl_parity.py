"""Qwen2-VL JAX vs HuggingFace parity at tiny random scale."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from attwarp_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    Qwen2VLModel,
    Qwen2VLTextConfig,
    Qwen2VLVisionConfig,
    get_mrope_positions,
    patchify_image,
    port_hf_qwen2vl_weights,
)

IMG_TOKEN = 97
VSTART = 96


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import (
        Qwen2VLConfig as HFQwen2VLConfig,
        Qwen2VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    hf_cfg = HFQwen2VLConfig(
        text_config=dict(
            vocab_size=128,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            rms_norm_eps=1e-6,
            rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
            max_position_embeddings=512,
        ),
        vision_config=dict(
            depth=2,
            embed_dim=32,
            hidden_size=48,
            num_heads=2,
            in_channels=3,
            patch_size=14,
            spatial_merge_size=2,
            temporal_patch_size=2,
            mlp_ratio=2,
            hidden_act="quick_gelu",
        ),
        image_token_id=IMG_TOKEN,
        video_token_id=98,
        vision_start_token_id=VSTART,
    )
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval()
    hf.config._attn_implementation = "eager"

    cfg = Qwen2VLConfig(
        vision=Qwen2VLVisionConfig(
            depth=2, embed_dim=32, hidden_size=48, num_heads=2,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            mlp_ratio=2,
        ),
        text=Qwen2VLTextConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, rope_theta=10000.0, mrope_section=(2, 2, 2),
        ),
        image_token_id=IMG_TOKEN,
        vision_start_token_id=VSTART,
        pad_token_id=2,  # HF tiny fixture falls back pad->eos
        eos_token_id=2,
    )
    params = port_hf_qwen2vl_weights(hf.state_dict(), cfg)
    return hf, Qwen2VLModel(cfg, params), cfg


def _make_inputs(rng, cfg, B=2):
    # 56x56 image -> grid (1, 4, 4) -> 16 patches -> 4 merged tokens
    img = rng.random((56, 56, 3)).astype(np.float32)
    patches, grid = patchify_image(img, cfg.vision)
    n_tok = (grid[1] // 2) * (grid[2] // 2)
    ids = rng.integers(3, 90, size=(B, 10 + n_tok)).astype(np.int64)
    ids[:, 2] = VSTART
    ids[:, 3 : 3 + n_tok] = IMG_TOKEN
    mask = np.ones_like(ids)
    return ids, mask, patches, grid


def test_patchify_matches_hf_processor(rng, tiny_pair):
    _, _, cfg = tiny_pair
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    proc = Qwen2VLImageProcessor(
        do_resize=False, do_rescale=False, do_normalize=False,
        patch_size=14, merge_size=2, temporal_patch_size=2,
    )
    img = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
    out = proc(images=[img], return_tensors="np")
    ours, grid = patchify_image(img.astype(np.float32), cfg.vision)
    np.testing.assert_array_equal(out["image_grid_thw"][0], np.asarray(grid))
    np.testing.assert_allclose(ours, out["pixel_values"], atol=1e-4)


def test_mrope_positions_match_hf(tiny_pair, rng):
    hf, _, cfg = tiny_pair
    ids, mask, _patches, grid = _make_inputs(rng, cfg)
    # left-pad sample 1
    ids[1, 0] = 0
    mask[1, 0] = 0
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.from_numpy(ids),
        image_grid_thw=torch.tensor([list(grid)]).repeat(2, 1)[:1].repeat(2, 1),
        attention_mask=torch.from_numpy(mask),
    )
    pos, delta = get_mrope_positions(ids, mask, grid, IMG_TOKEN, 2)
    valid = mask == 1
    np.testing.assert_array_equal(
        pos[:, valid], ref_pos.numpy()[:, valid]
    )
    np.testing.assert_array_equal(delta, ref_delta.numpy().squeeze(1))


def test_logits_match(tiny_pair, rng):
    hf, ours, cfg = tiny_pair
    ids, mask, patches, grid = _make_inputs(rng, cfg)
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(np.concatenate([patches, patches])),
            image_grid_thw=torch.tensor([list(grid)] * 2),
        )
    ref = out.logits[:, -1, :].numpy()
    got, _ = ours.forward_logits(ids, patches, grid, mask)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=1e-3)


def test_attention_row_matches(tiny_pair, rng):
    hf, ours, cfg = tiny_pair
    ids, mask, patches, grid = _make_inputs(rng, cfg)
    layer = 1
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(np.concatenate([patches, patches])),
            image_grid_thw=torch.tensor([list(grid)] * 2),
            output_attentions=True,
        )
    ref_row = out.attentions[layer][:, :, -1, :].numpy()
    _, row = ours.forward_logits(ids, patches, grid, mask, extract_layer=layer)
    np.testing.assert_allclose(np.asarray(row), ref_row, atol=3e-5)


def test_greedy_generation_matches_hf(tiny_pair, rng):
    hf, ours, cfg = tiny_pair
    ids, mask, patches, grid = _make_inputs(rng, cfg)
    K = 5
    with torch.no_grad():
        gen = hf.generate(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(np.concatenate([patches, patches])),
            image_grid_thw=torch.tensor([list(grid)] * 2),
            do_sample=False,
            max_new_tokens=K,
            use_cache=True,
        )
    ref_new = gen[:, ids.shape[1]:].numpy()
    our_ids, maps = ours.generate_with_attention(
        ids, patches, grid, mask, extract_layer=1, max_new_tokens=K
    )
    np.testing.assert_array_equal(np.asarray(our_ids), ref_new)
    assert maps.shape == (2, 2, 2)
    np.testing.assert_allclose(
        np.asarray(maps).reshape(2, -1).sum(-1), 1.0, atol=1e-5
    )

"""bf16 serving dtype: ported model runs in bf16 and tracks the f32 model."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from attwarp_tpu.extract.llava_backend import LlavaBackend
from attwarp_tpu.models import LlavaModel, port_hf_llava_weights

IMG_TOKEN = 99


def _tiny_hf():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(0)
    return LlavaForConditionalGeneration(
        HFLlavaConfig(
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
    ).eval()


def test_bf16_tracks_f32(rng):
    hf = _tiny_hf()
    cfg = LlavaBackend.config_from_hf(hf.config)
    m32 = LlavaModel(cfg, port_hf_llava_weights(hf.state_dict(), cfg))
    m16 = LlavaModel(
        cfg, port_hf_llava_weights(hf.state_dict(), cfg, dtype=jnp.bfloat16)
    )
    # all params stored bf16
    import jax

    assert all(
        l.dtype == jnp.bfloat16 for l in jax.tree_util.tree_leaves(m16.params)
    )
    ids = rng.integers(3, 90, size=(2, 11)).astype(np.int64)
    ids[:, 1:5] = IMG_TOKEN
    pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    lo32, _ = m32.forward_logits(jnp.asarray(ids), jnp.asarray(pixels))
    lo16, _ = m16.forward_logits(jnp.asarray(ids), jnp.asarray(pixels))
    scale = float(jnp.abs(lo32).max())
    assert float(jnp.abs(lo32 - lo16).max()) < 0.05 * scale

    gen16, maps16 = m16.generate_with_attention(
        jnp.asarray(ids), jnp.asarray(pixels), jnp.ones(ids.shape, bool),
        jnp.asarray([1, 1], jnp.int32), extract_layer=1, max_new_tokens=4,
    )
    assert gen16.shape == (2, 4)
    np.testing.assert_allclose(
        np.asarray(maps16).reshape(2, -1).sum(-1), 1.0, atol=1e-2
    )

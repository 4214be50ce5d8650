"""Tensor-parallel LLaVA: sharded generate matches unsharded output."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from attwarp_tpu.extract.llava_backend import LlavaBackend
from attwarp_tpu.models import LlavaModel, port_hf_llava_weights
from attwarp_tpu.parallel import make_mesh
from attwarp_tpu.parallel.llava_sharding import shard_llava_params

IMG_TOKEN = 99


@pytest.fixture(scope="module")
def tiny():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(
        HFLlavaConfig(
            vision_config=CLIPVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14,
            ),
            text_config=HFLlamaConfig(
                vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            ),
            image_token_index=IMG_TOKEN,
            vision_feature_layer=-2,
        )
    ).eval()
    cfg = LlavaBackend.config_from_hf(hf.config)
    params = port_hf_llava_weights(hf.state_dict(), cfg)
    return cfg, params


def test_tp_sharded_generate_matches(tiny, rng):
    assert len(jax.devices()) >= 8
    cfg, params = tiny
    model = LlavaModel(cfg, params)

    ids = rng.integers(3, 90, size=(2, 12)).astype(np.int64)
    ids[:, 2:6] = IMG_TOKEN
    pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    args = (
        jnp.asarray(ids),
        jnp.asarray(pixels),
        jnp.ones(ids.shape, bool),
        jnp.asarray([2, 2], jnp.int32),
    )
    gen_ref, maps_ref = model.generate_with_attention(*args, extract_layer=1, max_new_tokens=4)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_llava_params(params, mesh)
    model_tp = LlavaModel(cfg, sharded)
    gen_tp, maps_tp = model_tp.generate_with_attention(*args, extract_layer=1, max_new_tokens=4)

    np.testing.assert_array_equal(np.asarray(gen_tp), np.asarray(gen_ref))
    np.testing.assert_allclose(np.asarray(maps_tp), np.asarray(maps_ref), atol=1e-5)

    # the q_proj weight really is sharded over the model axis
    sh = sharded["llama"]["layers"][0]["q_proj"].sharding
    assert "model" in (sh.spec[0],), sh.spec


def test_tp_kv8_generate_matches(tiny, rng):
    """int8 KV cache + tensor parallelism compose: the sharded kv_quant
    generate is token-identical to the unsharded kv_quant one (the cache
    inherits head-axis sharding by propagation; quantization is per-(token,
    head), so it never crosses a shard boundary)."""
    assert len(jax.devices()) >= 8
    cfg, params = tiny
    model = LlavaModel(cfg, params)

    ids = rng.integers(3, 90, size=(2, 12)).astype(np.int64)
    ids[:, 2:6] = IMG_TOKEN
    pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    args = (
        jnp.asarray(ids),
        jnp.asarray(pixels),
        jnp.ones(ids.shape, bool),
        jnp.asarray([2, 2], jnp.int32),
    )
    gen_ref, maps_ref = model.generate_with_attention(
        *args, extract_layer=1, max_new_tokens=4, kv_quant=True
    )

    mesh = make_mesh(n_data=4, n_model=2)
    model_tp = LlavaModel(cfg, shard_llava_params(params, mesh))
    gen_tp, maps_tp = model_tp.generate_with_attention(
        *args, extract_layer=1, max_new_tokens=4, kv_quant=True
    )
    np.testing.assert_array_equal(np.asarray(gen_tp), np.asarray(gen_ref))
    np.testing.assert_allclose(np.asarray(maps_tp), np.asarray(maps_ref), atol=1e-5)


def test_tp_int8_generate_matches(tiny, rng):
    """int8 (w8a8) decoder + tensor parallelism compose: the sharded
    quantized generate is token-identical to the unsharded quantized one."""
    from attwarp_tpu.numerics.quant import quantize_decoder_params

    assert len(jax.devices()) >= 8
    cfg, params = tiny
    qparams = dict(params)
    qparams["llama"] = quantize_decoder_params(params["llama"])
    model = LlavaModel(cfg, qparams)

    ids = rng.integers(3, 90, size=(2, 12)).astype(np.int64)
    ids[:, 2:6] = IMG_TOKEN
    pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    args = (
        jnp.asarray(ids),
        jnp.asarray(pixels),
        jnp.ones(ids.shape, bool),
        jnp.asarray([2, 2], jnp.int32),
    )
    gen_ref, maps_ref = model.generate_with_attention(*args, extract_layer=1, max_new_tokens=4)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_llava_params(qparams, mesh)
    # int8 matrix keeps the column-parallel spec; its scale follows axis 0
    qp = sharded["llama"]["layers"][0]["q_proj"]
    assert qp["q"].dtype == jnp.int8 and qp["q"].sharding.spec[0] == "model"
    assert qp["s"].sharding.spec[0] == "model"
    dp = sharded["llama"]["layers"][0]["down_proj"]
    assert dp["s"].sharding.spec == (), dp["s"].sharding.spec  # row-parallel scale replicated

    model_tp = LlavaModel(cfg, sharded)
    gen_tp, maps_tp = model_tp.generate_with_attention(*args, extract_layer=1, max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(gen_tp), np.asarray(gen_ref))
    np.testing.assert_allclose(np.asarray(maps_tp), np.asarray(maps_ref), atol=1e-5)

"""Flash-attention prefill parity (dense vs Pallas flash kernel).

The extraction prefill (prompt + 576 image tokens at 7B) is HOT LOOP 1
(SURVEY §3.1); ``use_flash`` routes it through
``jax.experimental.pallas.ops.tpu.flash_attention``. On CPU the kernel runs
under the Mosaic TPU interpreter (numerically f32 — tighter than the bf16
on-chip kernel, whose measured deviations are ~0.7% logits / 5e-5 rows).

Reference cadence being preserved: the hook captures the prefill last-row
exactly once (llava.py:93-132); with flash enabled that row comes from a
separate O(T) pass (``_last_row_probs``) and must match the dense path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from attwarp_tpu.models.llama import LlamaConfig, llama_prefill


def _llama_params(cfg: LlamaConfig, seed: int = 0):
    rng = np.random.default_rng(seed)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    D, I = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.kv_heads * cfg.head_dim
    return {
        "embed_tokens": r(cfg.vocab_size, D),
        "norm": jnp.ones(D),
        "lm_head": r(cfg.vocab_size, D),
        "layers": [
            {
                "input_layernorm": jnp.ones(D),
                "post_attention_layernorm": jnp.ones(D),
                "q_proj": r(D, D),
                "k_proj": r(kvd, D),
                "v_proj": r(kvd, D),
                "o_proj": r(D, D),
                "gate_proj": r(I, D),
                "up_proj": r(I, D),
                "down_proj": r(D, I),
            }
            for _ in range(cfg.num_hidden_layers)
        ],
    }


# head_dim = 128 (the LLaMA/flash-kernel lane width)
_CFG = LlamaConfig(
    vocab_size=128, hidden_size=256, intermediate_size=512,
    num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
)


def _prefill_pair(extract_layer, gqa=False):
    cfg = _CFG if not gqa else LlamaConfig(
        vocab_size=128, hidden_size=512, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = _llama_params(cfg)
    rng = np.random.default_rng(1)
    B, T = 2, 256
    emb = jnp.asarray(rng.standard_normal((B, T, cfg.hidden_size)) * 0.1,
                      jnp.float32)
    mask = np.ones((B, T), bool)
    mask[0, :7] = False  # left padding on one sample
    mask = jnp.asarray(mask)
    dense = llama_prefill(params, cfg, emb, mask, max_seq=T,
                          extract_layer=extract_layer)
    with pltpu.force_tpu_interpret_mode():
        flash = llama_prefill(params, cfg, emb, mask, max_seq=T,
                              extract_layer=extract_layer, use_flash=True)
    return dense, flash


def test_flash_prefill_logits_match_dense():
    (lg_d, _, row_d), (lg_f, _, row_f) = _prefill_pair(extract_layer=1)
    scale = float(jnp.max(jnp.abs(lg_d)))
    assert float(jnp.max(jnp.abs(lg_f - lg_d))) / scale < 1e-4
    # extracted attention row: post-softmax probabilities, absolute scale
    np.testing.assert_allclose(np.asarray(row_f), np.asarray(row_d), atol=1e-5)
    # padding positions must carry zero attention in both paths
    assert float(jnp.max(row_f[0, :, :7])) < 1e-6


def test_flash_prefill_gqa_and_multilayer():
    (lg_d, _, rows_d), (lg_f, _, rows_f) = _prefill_pair(
        extract_layer=(0, 1), gqa=True
    )
    scale = float(jnp.max(jnp.abs(lg_d)))
    assert float(jnp.max(jnp.abs(lg_f - lg_d))) / scale < 1e-4
    assert rows_f.shape == rows_d.shape and rows_f.shape[0] == 2
    np.testing.assert_allclose(np.asarray(rows_f), np.asarray(rows_d),
                               atol=1e-5)


def test_flash_generate_with_attention_end_to_end():
    """use_flash through the full LLaVA generate: the prefill row is
    accumulated once and decode steps use the dense cached path, so maps and
    tokens must match the non-flash generate."""
    import __graft_entry__ as g
    from attwarp_tpu.models import (
        ClipVisionConfig, LlamaConfig as LC, LlavaConfig, LlavaModel,
    )

    lcfg = LlavaConfig(
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text=LlamaConfig(
            vocab_size=128, hidden_size=256, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        ),
        image_token_index=99,
    )
    params = g._random_llava_params(lcfg, jax.random.PRNGKey(3))
    model = LlavaModel(lcfg, params)
    rng = np.random.default_rng(2)
    # long enough for flash to engage (flash_prefill_supported: T >= 256)
    ids = rng.integers(3, 90, size=(2, 256)).astype(np.int64)
    ids[:, 2:6] = 99
    args = (
        jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32),
        jnp.ones(ids.shape, bool),
        jnp.asarray([2, 2], jnp.int32),
    )
    gen_d, maps_d = model.generate_with_attention(
        *args, extract_layer=1, max_new_tokens=3)
    with pltpu.force_tpu_interpret_mode():
        gen_f, maps_f = model.generate_with_attention(
            *args, extract_layer=1, max_new_tokens=3, use_flash=True)
    np.testing.assert_array_equal(np.asarray(gen_f), np.asarray(gen_d))
    np.testing.assert_allclose(np.asarray(maps_f), np.asarray(maps_d),
                               atol=1e-5)


def test_flash_short_prompt_falls_back_to_dense():
    """Prompts too short to tile use the dense path bit-identically (flash
    engages from 256 tokens; extraction prompts are ~640)."""
    from attwarp_tpu.models.llama import flash_prefill_supported

    assert not flash_prefill_supported(12)
    assert not flash_prefill_supported(192)
    assert flash_prefill_supported(640)   # the LLaVA extraction bucket
    assert flash_prefill_supported(704)   # next 64-token bucket (block 64)

    cfg = _CFG
    params = _llama_params(cfg)
    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.standard_normal((1, 24, cfg.hidden_size)) * 0.1,
                      jnp.float32)
    mask = jnp.ones((1, 24), bool)
    dense = llama_prefill(params, cfg, emb, mask, max_seq=24, extract_layer=0)
    flash = llama_prefill(params, cfg, emb, mask, max_seq=24, extract_layer=0,
                          use_flash=True)  # no interpret ctx needed: dense
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(flash[0]))
    np.testing.assert_array_equal(np.asarray(dense[2]), np.asarray(flash[2]))


def test_flash_cli_backend_suffix():
    """'+flash' on the backend spec flips use_flash (and composes with
    +int8); backends without a flash path reject it."""
    from attwarp_tpu.cli.process_dataset import make_backend

    with pytest.raises(ValueError, match="flash"):
        make_backend("mini+flash", 1)

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
    # ONE jitted dispatch, fully blocked before anything else dispatches:
    # the Mosaic interpreter's barrier callbacks dispatch jnp ops from XLA
    # execution threads, and a concurrent EAGER dispatch from this thread
    # can deadlock against them (futex-wait suite hang; diagnosed via
    # faulthandler round 3 — see CLAUDE.md "suite hang: SOLVED")
    flash_fn = jax.jit(lambda p, e, m: llama_prefill(
        p, cfg, e, m, max_seq=T, extract_layer=extract_layer, use_flash=True))
    with pltpu.force_tpu_interpret_mode():
        flash = jax.block_until_ready(flash_fn(params, emb, mask))
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
        # one jitted program; block before leaving the interpret context so
        # no later dispatch overlaps the interpreter's callback threads
        gen_f, maps_f = jax.block_until_ready(model.generate_with_attention(
            *args, extract_layer=1, max_new_tokens=3, use_flash=True))
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


# ── Qwen2-VL flash prefill (second family; VERDICT round-2 item 5) ──────


def _qwen_text_cfg(gqa=False):
    from attwarp_tpu.models.qwen2vl import Qwen2VLTextConfig

    # head_dim = 128 (flash-kernel lane width); mrope_section sums to 64
    if gqa:
        return Qwen2VLTextConfig(
            vocab_size=128, hidden_size=512, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0,
            mrope_section=(16, 24, 24),
        )
    return Qwen2VLTextConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        rope_theta=10000.0, mrope_section=(16, 24, 24),
    )


def _qwen_text_params(cfg, seed: int = 0):
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
                # Qwen q/k/v carry biases (HF convention)
                "q_proj": {"weight": r(D, D), "bias": r(D)},
                "k_proj": {"weight": r(kvd, D), "bias": r(kvd)},
                "v_proj": {"weight": r(kvd, D), "bias": r(kvd)},
                "o_proj": r(D, D),
                "gate_proj": r(I, D),
                "up_proj": r(I, D),
                "down_proj": r(D, I),
            }
            for _ in range(cfg.num_hidden_layers)
        ],
    }


def _qwen_prefill_pair(extract_layer, gqa=False):
    from attwarp_tpu.models.qwen2vl import mrope_cos_sin, qwen2vl_prefill

    cfg = _qwen_text_cfg(gqa)
    params = _qwen_text_params(cfg)
    rng = np.random.default_rng(1)
    B, T = 2, 256
    emb = jnp.asarray(rng.standard_normal((B, T, cfg.hidden_size)) * 0.1,
                      jnp.float32)
    mask = np.ones((B, T), bool)
    mask[0, :7] = False  # left padding on one sample
    mask = jnp.asarray(mask)
    # M-RoPE positions: three streams, text convention after the prompt
    pos = jnp.broadcast_to(jnp.arange(T)[None, None, :], (3, B, T))
    cos, sin = mrope_cos_sin(pos, cfg)
    dense = qwen2vl_prefill(params, cfg, emb, mask, cos, sin, max_seq=T,
                            extract_layer=extract_layer)
    # single jitted dispatch + block, same deadlock avoidance as the LLaVA
    # pair above
    flash_fn = jax.jit(lambda p, e, m, c, s: qwen2vl_prefill(
        p, cfg, e, m, c, s, max_seq=T, extract_layer=extract_layer,
        use_flash=True))
    with pltpu.force_tpu_interpret_mode():
        flash = jax.block_until_ready(flash_fn(params, emb, mask, cos, sin))
    return dense, flash


def test_qwen_flash_prefill_logits_match_dense():
    """The Qwen2-VL prefill's flash path (shared _flash_attn kernel; M-RoPE
    applied before attention) matches the dense path on logits, extract row,
    and KV cache — engine.py:374's family gate is gone."""
    (lg_d, kv_d, row_d), (lg_f, kv_f, row_f) = _qwen_prefill_pair(
        extract_layer=1)
    scale = float(jnp.max(jnp.abs(lg_d)))
    assert float(jnp.max(jnp.abs(lg_f - lg_d))) / scale < 1e-4
    np.testing.assert_allclose(np.asarray(row_f), np.asarray(row_d),
                               atol=1e-5)
    # padding positions carry zero attention in both paths
    assert float(jnp.max(row_f[0, :, :7])) < 1e-6
    # the KV cache matches at every VALID position (padding rows hold
    # garbage-by-design in both paths — masked queries produce different
    # garbage under flash segments vs dense -inf masking — and decode never
    # reads them); layer >= 1 carries the previous layer's flash-vs-dense
    # rounding, so tolerance is f32-epsilon-scaled, not exact
    kf, kd = np.asarray(kv_f[0]), np.asarray(kv_d[0])
    np.testing.assert_allclose(kf[:, :, 7:], kd[:, :, 7:], rtol=0, atol=5e-5)


def test_qwen_flash_prefill_gqa_and_multilayer():
    (lg_d, _, rows_d), (lg_f, _, rows_f) = _qwen_prefill_pair(
        extract_layer=(0, 1), gqa=True)
    scale = float(jnp.max(jnp.abs(lg_d)))
    assert float(jnp.max(jnp.abs(lg_f - lg_d))) / scale < 1e-4
    assert rows_f.shape == rows_d.shape and rows_f.shape[0] == 2
    np.testing.assert_allclose(np.asarray(rows_f), np.asarray(rows_d),
                               atol=1e-5)


def test_qwen_flash_short_prompt_falls_back_to_dense():
    from attwarp_tpu.models.qwen2vl import mrope_cos_sin, qwen2vl_prefill

    cfg = _qwen_text_cfg()
    params = _qwen_text_params(cfg)
    rng = np.random.default_rng(4)
    B, T = 1, 24
    emb = jnp.asarray(rng.standard_normal((B, T, cfg.hidden_size)) * 0.1,
                      jnp.float32)
    mask = jnp.ones((B, T), bool)
    pos = jnp.broadcast_to(jnp.arange(T)[None, None, :], (3, B, T))
    cos, sin = mrope_cos_sin(pos, cfg)
    dense = qwen2vl_prefill(params, cfg, emb, mask, cos, sin, max_seq=T,
                            extract_layer=0)
    flash = qwen2vl_prefill(params, cfg, emb, mask, cos, sin, max_seq=T,
                            extract_layer=0, use_flash=True)  # dense fallback
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(flash[0]))
    np.testing.assert_array_equal(np.asarray(dense[2]), np.asarray(flash[2]))

"""Chunked-prefill engine: token parity with the base engine and with
per-request generate — the prefill riding the decode ticks changes WHERE
the prompt's layers run, not any request's math (serving/chunked.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from attwarp_tpu.serving import ChunkedPrefillEngine, ServeEngine

IMG_TOKEN = 99


@pytest.fixture(scope="module")
def model():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    from attwarp_tpu.models import LlavaModel, port_hf_llava_weights
    from attwarp_tpu.extract.llava_backend import LlavaBackend

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
            image_token_index=IMG_TOKEN,
            vision_feature_layer=-2,
        )
    ).eval()
    cfg = LlavaBackend.config_from_hf(hf.config)
    params = port_hf_llava_weights(hf.state_dict(), cfg)
    return LlavaModel(cfg, params)


def _reference_tokens(model, ids, pixels, max_new):
    gen, _ = model.generate_with_attention(
        jnp.asarray(ids[None]), jnp.asarray(pixels[None], jnp.float32),
        jnp.ones((1, len(ids)), bool),
        jnp.asarray([int(np.argmax(ids == IMG_TOKEN))], jnp.int32),
        extract_layer=None, max_new_tokens=max_new,
    )
    row = [int(t) for t in np.asarray(gen)[0]]
    if model.cfg.eos_token_id in row:
        row = row[: row.index(model.cfg.eos_token_id) + 1]
    return row


def _mk_request(rng, T, n_img=4):
    ids = rng.integers(3, 90, size=(T,)).astype(np.int64)
    ids[2 : 2 + n_img] = IMG_TOKEN
    pixels = rng.standard_normal((28, 28, 3)).astype(np.float32)
    return ids, pixels


@pytest.mark.parametrize("kv_quant,P,steps_per_tick", [
    (False, 8, 4),     # several chunks per prompt, chunks span ticks
    (False, 16, 2),    # one chunk covers short buckets
    (True, 8, 4),      # int8 cache write-through
])
def test_chunked_matches_per_request_generate(model, rng, kv_quant, P,
                                              steps_per_tick):
    """More requests than slots, mixed prompt lengths: greedy tokens equal
    the per-request generate. Covers prompts whose chunk sequences cross
    tick boundaries and slot reuse after retirement."""
    eng = ChunkedPrefillEngine(
        model, slots=2, max_seq=96, bucket=16, kv_quant=kv_quant,
        steps_per_tick=steps_per_tick, prefill_chunk=P, stage_len=48,
    )
    reqs = []
    for T in (10, 13, 17, 9, 21, 33):
        ids, px = _mk_request(rng, T)
        rid = eng.submit(ids, px, max_new_tokens=5)
        reqs.append((rid, ids, px))
    out = eng.run()
    assert set(out) == {r[0] for r in reqs}
    for rid, ids, px in reqs:
        ref = _reference_tokens(model, ids, px, 5)
        if kv_quant:
            # chunk attention reads exact bf16 staging, so the first token
            # matches the monolithic prefill exactly; decode history is
            # int8-quantized (same contract as the base engine)
            assert out[rid][0] == ref[0], (rid, out[rid], ref)
            assert len(out[rid]) <= 5
        else:
            assert out[rid] == ref, (rid, out[rid], ref)


def test_chunked_matches_base_engine(model, rng):
    """Dense cache: the chunked engine's tokens equal the base engine's for
    the same request stream (admission path changes, math does not)."""
    streams = []
    for T in (12, 18, 9, 26, 15):
        streams.append(_mk_request(rng, T))
    base = ServeEngine(model, slots=2, max_seq=96, bucket=16,
                       steps_per_tick=3)
    chk = ChunkedPrefillEngine(model, slots=2, max_seq=96, bucket=16,
                               steps_per_tick=3, prefill_chunk=8,
                               stage_len=32)
    outs = []
    for eng in (base, chk):
        rids = [eng.submit(ids, px, max_new_tokens=6) for ids, px in streams]
        out = eng.run()
        outs.append([out[r] for r in rids])
    assert outs[0] == outs[1]


def test_chunked_text_only_and_sampling_flags(model, rng):
    """Text-only requests (no vision tower trace) and a sampling request
    mixed with greedy ones complete; greedy requests stay deterministic."""
    eng = ChunkedPrefillEngine(model, slots=2, max_seq=96, bucket=16,
                               steps_per_tick=4, prefill_chunk=8,
                               stage_len=32)
    ids = rng.integers(3, 90, size=(11,)).astype(np.int64)
    r1 = eng.submit(ids, None, max_new_tokens=4)
    ids2, px2 = _mk_request(rng, 14)
    r2 = eng.submit(ids2, px2, max_new_tokens=4, temperature=0.8)
    out = eng.run()
    assert set(out) == {r1, r2}
    assert all(1 <= len(v) <= 4 for v in out.values())
    # greedy text-only request reproduces across engines
    eng2 = ChunkedPrefillEngine(model, slots=2, max_seq=96, bucket=16,
                                steps_per_tick=4, prefill_chunk=8,
                                stage_len=32)
    r3 = eng2.submit(ids, None, max_new_tokens=4)
    assert eng2.run()[r3] == out[r1]


def test_chunked_rejects_oversized_prompt(model, rng):
    eng = ChunkedPrefillEngine(model, slots=2, max_seq=96, bucket=16,
                               prefill_chunk=8, stage_len=32)
    ids, px = _mk_request(rng, 40)   # bucket 48 > stage_len 32
    with pytest.raises(ValueError, match="stage_len"):
        eng.submit(ids, px, max_new_tokens=4)


def test_chunked_requires_fitting_chunk_grid(model):
    with pytest.raises(ValueError, match="chunk grid"):
        ChunkedPrefillEngine(model, slots=2, max_seq=100, bucket=16,
                             prefill_chunk=48, stage_len=100)

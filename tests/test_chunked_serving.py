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


def test_serve_cli_chunked_prefill(model, rng, tmp_path):
    """cli.serve --chunked-prefill P routes through ChunkedPrefillEngine."""
    import json

    from PIL import Image

    from attwarp_tpu.extract.llava_backend import LlavaBackend
    from attwarp_tpu.cli.serve import main as serve_main

    be = LlavaBackend(model)
    be.save(tmp_path / "ckpt")
    img = tmp_path / "im.png"
    Image.fromarray((rng.random((40, 48, 3)) * 255).astype(np.uint8)).save(img)
    ids1 = rng.integers(3, 90, size=(12,)).tolist()
    ids1[2:6] = [IMG_TOKEN] * 4
    reqs = tmp_path / "reqs.jsonl"
    with open(reqs, "w") as f:
        f.write(json.dumps({"image_path": str(img), "input_ids": ids1}) + "\n")
        f.write(json.dumps(
            {"input_ids": rng.integers(3, 90, size=(9,)).tolist()}) + "\n")
    out = tmp_path / "answers.jsonl"
    rc = serve_main([
        "--backend", f"llava-ckpt:{tmp_path / 'ckpt'}",
        "--jsonl", str(reqs), "--output", str(out),
        "--slots", "2", "--max-seq", "768", "--max-new-tokens", "4",
        "--steps-per-tick", "2", "--chunked-prefill", "16",
    ])
    assert rc == 0
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 2
    assert all(1 <= len(r["tokens"]) <= 4 for r in rows)


@pytest.fixture(scope="module")
def qwen_model():
    from transformers import (
        Qwen2VLConfig as HFQwen2VLConfig,
        Qwen2VLForConditionalGeneration,
    )

    from attwarp_tpu.extract.qwen2vl_backend import Qwen2VLBackend
    from attwarp_tpu.models.qwen2vl import Qwen2VLModel, port_hf_qwen2vl_weights

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
            image_token_id=97, video_token_id=98, vision_start_token_id=96,
        )
    ).eval()
    cfg = Qwen2VLBackend.config_from_hf(hf.config)
    return Qwen2VLModel(cfg, port_hf_qwen2vl_weights(hf.state_dict(), cfg))


@pytest.mark.parametrize("kv_quant", [False, True])
def test_chunked_qwen_matches_per_request_generate(qwen_model, rng, kv_quant):
    """Second family: chunked admission (per-chunk M-RoPE slices, per-slot
    decode deltas) matches per-request generate — including MIXED image
    shapes in one stream, which the chunked path serves without any
    pixel-shape grouping."""
    from attwarp_tpu.models.qwen2vl import patchify_image

    m = qwen_model
    eng = ChunkedPrefillEngine(m, slots=2, max_seq=96, bucket=16,
                               kv_quant=kv_quant, steps_per_tick=4,
                               prefill_chunk=8, stage_len=48)
    reqs = []
    for T, side in ((12, 56), (15, 84), (10, 56), (11, None), (17, 84)):
        ids = rng.integers(3, 90, size=(T,)).astype(np.int64)
        img = None
        if side is not None:
            n_tok = (side // 14 // 2) ** 2
            ids[1] = 96
            ids[2:2 + n_tok] = 97
            img = rng.standard_normal((side, side, 3)).astype(np.float32)
        rid = eng.submit(ids, img, max_new_tokens=4)
        reqs.append((rid, ids, img))
    out = eng.run()
    assert set(out) == {r[0] for r in reqs}
    for rid, ids, img in reqs:
        patches, grid = patchify_image(
            img if img is not None
            else np.zeros((28, 28, 3), np.float32), m.cfg.vision)
        gen, _ = m.generate_with_attention(
            ids[None], patches, grid, np.ones((1, len(ids)), np.int64),
            extract_layer=None, max_new_tokens=4,
        )
        ref = [int(t) for t in np.asarray(gen)[0]]
        if m.cfg.eos_token_id in ref:
            ref = ref[: ref.index(m.cfg.eos_token_id) + 1]
        if kv_quant:
            assert out[rid][0] == ref[0], (rid, out[rid], ref)
        else:
            assert out[rid] == ref, (rid, out[rid], ref)

"""Disaggregated prefill/decode serving: token parity across device groups.

`serving/disagg.py` moves admission prefills to their own device group
(the single-chip engine is admission-bound at its measured optimum —
ARCHITECTURE.md). Disaggregation must change WHERE the prefill runs, not
its math: every request's tokens must equal the single-group engine's and
per-request generate's. Runs on the conftest 8-device CPU mesh (4 decode
+ 4 prefill devices)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from attwarp_tpu.serving import DisaggServeEngine, ServeEngine, split_meshes

IMG = 99


@pytest.fixture(scope="module")
def model():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    from attwarp_tpu.extract.llava_backend import LlavaBackend
    from attwarp_tpu.models import LlavaModel, port_hf_llava_weights

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
            image_token_index=IMG,
            vision_feature_layer=-2,
        )
    ).eval()
    cfg = LlavaBackend.config_from_hf(hf.config)
    params = port_hf_llava_weights(hf.state_dict(), cfg)
    return LlavaModel(cfg, params)


def _mk_request(rng, T, n_img=4):
    ids = rng.integers(3, 90, size=(T,)).astype(np.int64)
    ids[2 : 2 + n_img] = IMG
    pixels = rng.standard_normal((28, 28, 3)).astype(np.float32)
    return ids, pixels


def test_split_meshes_partition():
    d_mesh, p_mesh = split_meshes()
    d_devs = set(np.asarray(d_mesh.devices).ravel().tolist())
    p_devs = set(np.asarray(p_mesh.devices).ravel().tolist())
    assert not (d_devs & p_devs), "groups must be disjoint"
    assert len(d_devs) + len(p_devs) == len(jax.devices())


@pytest.mark.parametrize("kv_quant", [False, True])
def test_disagg_matches_single_group_engine(model, kv_quant):
    """Same request stream through DisaggServeEngine and ServeEngine:
    identical tokens per request (and the KV block lands on the decode
    group)."""
    from attwarp_tpu.models import LlavaModel

    d_mesh, p_mesh = split_meshes()
    p_model = LlavaModel(model.cfg, jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                p_mesh, jax.sharding.PartitionSpec())),
        model.params))
    kw = dict(slots=2, max_seq=96, bucket=16, kv_quant=kv_quant,
              steps_per_tick=4)
    eng_d = DisaggServeEngine(model, prefill_model=p_model,
                              decode_mesh=d_mesh, prefill_mesh=p_mesh, **kw)
    eng_s = ServeEngine(model, **kw)

    rng = np.random.default_rng(5)
    reqs = [_mk_request(rng, 9 + (i % 4)) for i in range(5)]
    rids_d = [eng_d.submit(ids, px, max_new_tokens=5) for ids, px in reqs]
    rids_s = [eng_s.submit(ids, px, max_new_tokens=5) for ids, px in reqs]
    out_d, out_s = eng_d.run(), eng_s.run()
    for rd, rs in zip(rids_d, rids_s):
        assert out_d[rd] == out_s[rs], (out_d[rd], out_s[rs])

    # the engine cache must live on the decode group only
    kv_leaves = jax.tree_util.tree_leaves(eng_d.kv)
    d_devs = set(np.asarray(d_mesh.devices).ravel().tolist())
    for leaf in kv_leaves:
        assert set(leaf.sharding.device_set) <= d_devs

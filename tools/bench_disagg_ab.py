"""Disaggregated-serving A/B on the virtual CPU mesh: disagg 4+4 vs
single-group, fixed workload, wall-clock + TTFT.

WHAT THIS DEMONSTRATES (and what it cannot). `serving/disagg.py` moves
admission prefills to their own device group so prefill and decode overlap
in wall clock on real hardware. This environment has ONE TPU chip (disagg
needs >=2) and the only multi-device mesh is 8 virtual CPU devices on a
single host core — virtual devices TIME-SLICE one core, so wall-clock
overlap is physically impossible here and the A/B cannot show a speedup.
What it does pin, with numbers: (a) the disagg engine completes the same
fixed workload with the same tokens at comparable wall-clock (the
cross-group KV `device_put` and second weight copy cost ~nothing even when
every program shares one core), and (b) the TTFT accounting flows through
the disagg admission path identically. The wall-clock-overlap claim on
real hardware rests on the transfer/overlap accounting in ARCHITECTURE.md
(per-admission KV-block bytes vs ICI capacity: ~0.9 GB/s needed vs
hundreds available) plus JAX's per-device async dispatch, which
`tests/test_disagg.py` shows is never blocked by the host between groups.

Usage: python tools/bench_disagg_ab.py [--requests 24] [--out PATH]
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

IMG = 99


def build_model(seed=0):
    """Random small LLaVA (HF-ported so both engines share exact weights)."""
    import torch
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig as HFLlamaConfig,
        LlavaConfig as HFLlavaConfig,
        LlavaForConditionalGeneration,
    )

    from attwarp_tpu.extract.llava_backend import LlavaBackend
    from attwarp_tpu.models import LlavaModel, port_hf_llava_weights

    torch.manual_seed(seed)
    hf = LlavaForConditionalGeneration(
        HFLlavaConfig(
            vision_config=CLIPVisionConfig(
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, image_size=28, patch_size=14,
            ),
            text_config=HFLlamaConfig(
                vocab_size=512, hidden_size=256, intermediate_size=512,
                num_hidden_layers=4, num_attention_heads=8,
                num_key_value_heads=4,
            ),
            image_token_index=IMG,
            vision_feature_layer=-2,
        )
    ).eval()
    cfg = LlavaBackend.config_from_hf(hf.config)
    params = port_hf_llava_weights(hf.state_dict(), cfg)
    return LlavaModel(cfg, params)


def make_requests(n, rng):
    reqs = []
    for i in range(n):
        T = 72 + 8 * (i % 4)                      # mixed prompt lengths
        ids = rng.integers(3, 400, size=(T,)).astype(np.int64)
        ids[2:6] = IMG
        px = rng.standard_normal((28, 28, 3)).astype(np.float32)
        reqs.append((ids, px))
    return reqs


def drive(engine, reqs, max_new):
    t0 = time.perf_counter()
    rids = [engine.submit(ids, px, max_new_tokens=max_new)
            for ids, px in reqs]
    out = engine.run()
    wall = time.perf_counter() - t0
    ttfts = sorted(
        engine.request_stats[r]["first_token"] - engine.request_stats[r]["submit"]
        for r in rids
    )
    toks = sum(len(out[r]) for r in rids)
    return {
        "wall_s": round(wall, 3),
        "agg_tok_s": round(toks / wall, 2),
        "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3),
        "ttft_p95_s": round(ttfts[int(len(ttfts) * 0.95)], 3),
        "total_tokens": toks,
    }, {r: out[r] for r in rids}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--max-new", type=int, default=24)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--out", default="eval_results/disagg_ab_cpu.json")
    args = ap.parse_args()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from attwarp_tpu.models import LlavaModel
    from attwarp_tpu.serving import DisaggServeEngine, ServeEngine, split_meshes

    model = build_model()
    d_mesh, p_mesh = split_meshes()
    # BOTH sides run replicated over a 4-device group: on a time-sliced
    # host, a replicated SPMD program executes once PER virtual device, so
    # a single-device baseline would be ~4x faster by artifact alone and
    # the A/B would measure the mesh, not the disagg machinery. With the
    # single-group engine on the same 4-device decode mesh, the only
    # difference left is what disagg adds: the second (prefill-group)
    # weight copy, the cross-group KV device_put, and the split dispatch.
    d_model = LlavaModel(model.cfg, jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(d_mesh, P())),
        model.params))
    p_model = LlavaModel(model.cfg, jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(p_mesh, P())),
        model.params))
    kw = dict(slots=args.slots, max_seq=192, bucket=32, kv_quant=False,
              steps_per_tick=4, admit_batch=2)

    def fresh(kind):
        if kind == "single":
            return ServeEngine(d_model, **kw)
        return DisaggServeEngine(d_model, prefill_model=p_model,
                                 decode_mesh=d_mesh, prefill_mesh=p_mesh, **kw)

    rng = np.random.default_rng(7)
    reqs = make_requests(args.requests, rng)

    results = {}
    tokens = {}
    for kind in ("single", "disagg"):
        drive(fresh(kind), reqs, args.max_new)          # warm-up: compiles
        results[kind], tokens[kind] = drive(fresh(kind), reqs, args.max_new)

    assert tokens["single"] == tokens["disagg"], "token parity violated"
    report = {
        "workload": {
            "requests": args.requests, "max_new": args.max_new,
            "slots": args.slots, "prompt_lens": "72-96 (bucket 32)",
            "mesh": "8 virtual CPU devices on ONE host core (time-sliced)",
        },
        "single_group": results["single"],
        "disagg_4p4": results["disagg"],
        "wall_ratio_disagg_over_single": round(
            results["disagg"]["wall_s"] / results["single"]["wall_s"], 3),
        "token_parity": True,
        "note": (
            "one host core => virtual devices time-slice; wall-clock overlap "
            "is impossible here by construction. This pins cost-neutrality "
            "of the disagg machinery (cross-group device_put + second weight "
            "copy) and TTFT accounting; the real-hardware overlap argument "
            "is the ICI transfer accounting in ARCHITECTURE.md."
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

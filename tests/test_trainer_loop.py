"""End-to-end trainer loop smoke test on a synthetic manifest dataset."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from attwarp_tpu.train import TrainConfig
from attwarp_tpu.train.trainer import train_loop


def _make_root(tmp_path, name, n, rng):
    root = tmp_path / name
    (root / "logs").mkdir(parents=True)
    (root / "npy").mkdir()
    (root / "images").mkdir()
    with open(root / "logs" / "metadata.jsonl", "w") as f:
        for i in range(n):
            img_path = str(root / "images" / f"im{i}.png")
            Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(img_path)
            npy_path = str(root / "npy" / f"att{i}.npy")
            np.save(npy_path, rng.random((24, 24)).astype(np.float32))
            f.write(
                json.dumps(
                    {
                        "question": f"what is item {i}?",
                        "answer": f"a{i}",
                        "image_path": img_path,
                        "bucket": "query_rel" if name == "gqa" else None,
                        "artifacts": [
                            {"type": "relative", "layer": 16, "npy_path": npy_path}
                        ],
                    }
                )
                + "\n"
            )
    return str(root)


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path, rng):
    from attwarp_tpu.extract.extraction import MiniLLaVABackend
    from attwarp_tpu.extract.features import MiniFeatureExtractor
    from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

    roots = [_make_root(tmp_path, n, 8, rng) for n in ("gqa", "textvqa", "docvqa")]
    cfg = TrainConfig(
        gqa_root_dir=roots[0],
        textvqa_root_dir=roots[1],
        docvqa_root_dir=roots[2],
        num_per_ds=6,
        image_size=48,
        epochs=2,
        batch_size=4,
        hidden=32,
        experiments_root=str(tmp_path / "exp"),
        vis_every=2,
        log_every=1,
        mesh_data=None,
        mesh_model=1,
    )
    be_cfg = MiniLLaVAConfig(
        vocab=256, d_model=32, n_heads=2, n_layers=2, extract_layer=1,
        num_patches=4, image_size=32, max_seq=96,
    )
    feats = MiniFeatureExtractor(__import__("attwarp_tpu.extract.extraction", fromlist=["MiniLLaVABackend"]).MiniLLaVABackend(be_cfg))

    run_dir = train_loop(cfg, feature_extractor=feats)
    assert run_dir.exists()
    assert (run_dir / "run_snapshot.json").exists()
    assert (run_dir / "metrics.jsonl").exists() or True  # wandb absent -> jsonl
    ckpts = list((run_dir / "checkpoints").glob("marginal_net_epoch_*"))
    assert any(p.is_dir() for p in ckpts), ckpts
    # metrics recorded and finite
    lines = [
        json.loads(l)
        for l in open(run_dir / "metrics.jsonl")
        if l.strip()
    ]
    losses = [l["loss/train_total"] for l in lines if "loss/train_total" in l]
    assert losses and all(np.isfinite(losses))
    # debug artifacts
    assert list((run_dir / "debug").glob("train_*.png"))
    assert (run_dir / "curves" / "loss.png").exists()


@pytest.mark.slow
def test_checkpoint_restore_roundtrip(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from attwarp_tpu.train import create_train_state
    from attwarp_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = TrainConfig(hidden=32)
    batch = {
        "fmap_v": jnp.asarray(rng.random((2, 4, 4, 16)), jnp.float32),
        "ttok": jnp.asarray(rng.random((2, 6, 16)), jnp.float32),
        "tmask": jnp.ones((2, 6, 1), jnp.float32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    p = save_checkpoint(tmp_path / "ck", 3, state, cfg)
    assert p.exists()
    ep, path = latest_checkpoint(tmp_path / "ck")
    assert ep == 3
    restored = restore_checkpoint(path, state)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

"""The saved_paths metadata schema is API (SURVEY §5): the drivers write it,
the eval harness and the legacy training dataset consume it. This test runs
the real driver and feeds its artifacts into MixedMetadataDataset and the
training collate — the full reference data flow, end to end."""

import json

import numpy as np
from PIL import Image

from attwarp_tpu.cli.process_dataset import process_dataset
from attwarp_tpu.data import MixedMetadataDataset, collate


def _mini_backend():
    from attwarp_tpu.extract.extraction import MiniLLaVABackend
    from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig

    return MiniLLaVABackend(
        MiniLLaVAConfig(
            vocab=256, d_model=32, n_heads=2, n_layers=2, extract_layer=1,
            num_patches=4, image_size=32, max_seq=96,
        )
    )


def test_driver_output_feeds_legacy_dataset(rng, tmp_path):
    # 1. drive the processing pipeline over a tiny TextVQA fixture
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    data = {"data": []}
    for i in range(3):
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(
            img_dir / f"im{i}.jpg"
        )
        # "answer" included so the same metadata also satisfies the legacy
        # dataset's GQA branch (GQA logs carry a single answer field)
        data["data"].append(
            {"image_id": f"im{i}", "question": f"what {i}?",
             "answers": ["x"] * 10, "answer": "x"}
        )
    tv_json = tmp_path / "tv.json"
    tv_json.write_text(json.dumps(data))

    out = tmp_path / "proc"
    stats = process_dataset(
        str(tv_json), str(img_dir), str(out), _mini_backend(),
        batch_size=3, max_new_tokens=2, width=48, height=48,
    )
    assert stats == {"processed": 3, "failed": 0}

    # 2. the legacy dataset consumes the metadata dir directly
    meta_dir = str(out / "metadata")
    ds = MixedMetadataDataset(
        gqa_metadata_dir=meta_dir,
        textvqa_metadata_dir=meta_dir,
        num_samples_per_dataset=3,
        image_size=32,
        random_seed=0,
    )
    assert len(ds) == 6
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["attention_map"].shape == (32, 32)
    assert item["saved_warped_image"].shape == (32, 32, 3)
    # warped image actually loaded (non-zero), not the zero fallback
    assert item["saved_warped_image"].max() > 0

    # 3. and the training collate accepts it
    batch = collate([ds[i] for i in range(4)])
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["sqrt_mask"].shape == (4,)

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


class _StubMultiLayerBackend:
    """Duck-typed backend returning (L, B, h, w) maps like a tuple
    extract_layer on the real MLLM backends."""

    image_size = 32
    num_patches_side = 4
    extract_layer = (0, 5)
    name = "stub-multi"

    def extract(self, images, questions, max_new_tokens=20):
        B = len(images)
        maps = np.zeros((2, B, 4, 4), np.float32)
        maps[0, :, 0, 0] = 1.0           # layer 0: corner peak
        maps[1] = 1.0 / 16               # layer 5: uniform
        return maps, ["ans"] * B


def test_driver_multilayer_artifacts(rng, tmp_path):
    """A tuple extract_layer writes one raw map per layer, keeps the first
    layer as the primary artifact, and records extract_layers in metadata."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    data = {"data": []}
    for i in range(2):
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(
            img_dir / f"im{i}.jpg"
        )
        data["data"].append(
            {"image_id": f"im{i}", "question": f"what {i}?", "answers": ["x"] * 10}
        )
    tv_json = tmp_path / "tv.json"
    tv_json.write_text(json.dumps(data))

    out = tmp_path / "proc_ml"
    stats = process_dataset(
        str(tv_json), str(img_dir), str(out), _StubMultiLayerBackend(),
        batch_size=2, max_new_tokens=2, width=48, height=48,
    )
    assert stats == {"processed": 2, "failed": 0}

    raw = sorted(p.name for p in (out / "raw_attention_maps").iterdir())
    assert any("layer0" in n for n in raw) and any("layer5" in n for n in raw)
    meta = json.loads(
        sorted((out / "metadata").iterdir())[0].read_text()
    )
    assert meta["extract_layers"] == [0, 5]
    paths = meta["saved_paths"]["raw_attention_maps_per_layer"]
    assert set(paths) == {"0", "5"}
    primary = np.load(meta["saved_paths"]["raw_attention_map_npy"])
    assert primary.shape == (1, 1, 4, 4)
    np.testing.assert_array_equal(primary, np.load(paths["0"]))  # first layer
    assert not np.array_equal(primary, np.load(paths["5"]))


def test_parse_layer_spec():
    import pytest

    from attwarp_tpu.cli.process_dataset import parse_layer_spec

    assert parse_layer_spec("20") == 20
    assert parse_layer_spec(7) == 7
    assert parse_layer_spec("4,8,20") == (4, 8, 20)
    assert parse_layer_spec("4,") == 4
    with pytest.raises(ValueError):
        parse_layer_spec("")

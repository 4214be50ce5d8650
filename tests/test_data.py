"""Data subsystem tests over synthetic manifest trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from attwarp_tpu.data import (
    FullDataset,
    GQA_CATEGORY_TO_TRANSFORM,
    ProgressManifest,
    TextVQADataset,
    batch_iterator,
    collate,
    select_artifact,
    transform_for_sample,
)
from attwarp_tpu.data.loader import split_indices


def _make_root(tmp_path, name, n, rng, with_bucket=False):
    root = tmp_path / name
    (root / "logs").mkdir(parents=True)
    (root / "npy").mkdir()
    (root / "images").mkdir()
    entries = []
    for i in range(n):
        img_path = str(root / "images" / f"im{i}.png")
        Image.fromarray((rng.random((32, 40, 3)) * 255).astype(np.uint8)).save(img_path)
        npy_path = str(root / "npy" / f"att{i}.npy")
        np.save(npy_path, (rng.random((24, 24)) * 3).astype(np.float32))
        entry = {
            "question": f"q{i}?",
            "answer": f"a{i}",
            "image_path": img_path,
            "question_id": f"{name}-{i}",
            "artifacts": [
                {"type": "relative", "layer": 16, "npy_path": npy_path},
                {"type": "absolute", "layer": 20, "npy_path": npy_path},
            ],
        }
        if with_bucket:
            entry["bucket"] = "query_rel" if i % 2 == 0 else "logical_attr"
        entries.append(entry)
    with open(root / "logs" / "metadata.jsonl", "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(root)


def test_full_dataset_and_collate(tmp_path, rng):
    gqa = _make_root(tmp_path, "gqa", 6, rng, with_bucket=True)
    tv = _make_root(tmp_path, "textvqa", 6, rng)
    dv = _make_root(tmp_path, "docvqa", 6, rng)
    ds = FullDataset(gqa, tv, dv, num_samples_per_dataset=4, image_size=48, random_seed=13)
    assert len(ds) == 12
    item = ds[0]
    assert item["image"].shape == (48, 48, 3)
    assert item["attention_map"].shape == (48, 48)
    assert 0.0 <= item["attention_map"].max() <= 1.0

    # deterministic sampling for fixed seed
    ds2 = FullDataset(gqa, tv, dv, num_samples_per_dataset=4, image_size=48, random_seed=13)
    assert [s.get("question_id") for s, _ in ds.samples] == [
        s.get("question_id") for s, _ in ds2.samples
    ]

    batch = collate([ds[i] for i in range(4)])
    assert batch["image"].shape == (4, 48, 48, 3)
    assert batch["sqrt_mask"].shape == (4,)
    for i in range(4):
        t = transform_for_sample(batch["dataset"][i], batch["bucket"][i], GQA_CATEGORY_TO_TRANSFORM)
        assert batch["sqrt_mask"][i] == (1.0 if t == "sqrt" else 0.0)
        assert batch["none_mask"][i] == (1.0 if t == "none" else 0.0)


def test_full_dataset_insufficient_samples(tmp_path, rng):
    gqa = _make_root(tmp_path, "gqa2", 2, rng)
    with pytest.raises(ValueError):
        FullDataset(gqa, gqa, gqa, num_samples_per_dataset=5)


def test_select_artifact_fallbacks():
    arts = [
        {"type": "relative", "layer": 8, "npy_path": "a"},
        {"type": "relative", "layer": 20, "npy_path": "b"},
        {"type": "absolute", "layer": 16, "npy_path": "c"},
    ]
    assert select_artifact(arts, 20, "relative")["npy_path"] == "b"
    # no exact layer -> highest layer of same type
    assert select_artifact(arts, 16, "relative")["npy_path"] == "b"
    # unknown type -> fall back to ALL artifacts, exact layer wins
    assert select_artifact(arts, 16, "weird")["npy_path"] == "c"
    assert select_artifact([], 16, "relative") is None


def test_transform_routing():
    m = GQA_CATEGORY_TO_TRANSFORM
    assert transform_for_sample("gqa", "query_rel", m) == "sqrt"
    assert transform_for_sample("gqa", "logical_attr", m) == "none"
    assert transform_for_sample("gqa", "unknown_bucket", m) == "sqrt"
    assert transform_for_sample("textvqa", None, m) == "iden"
    assert transform_for_sample(None, None, m) == "iden"


def test_batch_iterator_and_split(tmp_path, rng):
    gqa = _make_root(tmp_path, "g3", 5, rng)
    ds = FullDataset(gqa, gqa, gqa, num_samples_per_dataset=4, image_size=32, random_seed=1)
    train_idx, val_idx = split_indices(len(ds), 0.25, seed=1)
    assert len(train_idx) + len(val_idx) == 12
    batches = list(batch_iterator(ds, train_idx, batch_size=4, shuffle=True, seed=0))
    assert all(b["image"].shape[0] == 4 for b in batches)
    assert len(batches) == len(train_idx) // 4


def test_textvqa_download_fallback(tmp_path, rng):
    """Missing local image + download_images=True fetches from the sample's
    flickr URL (file:// here — same urllib path) and caches it as
    {image_id}.jpg, matching main.py:156-177; disabled -> None."""
    src = tmp_path / "remote.jpg"
    arr = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(src)
    data = {"dataset_type": "val", "dataset_name": "textvqa",
            "dataset_version": "0.5.1",
            "data": [{"image_id": "img1", "question": "q?",
                      "answers": ["a"],
                      "flickr_original_url": src.as_uri()}]}
    jp = tmp_path / "tv.json"
    jp.write_text(json.dumps(data))
    img_dir = tmp_path / "imgs"

    off = TextVQADataset(str(jp), image_dir=str(img_dir))
    assert off[0]["loaded_image"] is None  # zero-egress default: skip

    ds = TextVQADataset(str(jp), image_dir=str(img_dir), download_images=True)
    got = ds[0]["loaded_image"]
    assert got is not None and got.shape == (20, 24, 3)
    assert (img_dir / "img1.jpg").exists()  # cached
    # second access loads from cache (works even with download disabled now)
    again = TextVQADataset(str(jp), image_dir=str(img_dir))[0]["loaded_image"]
    assert again is not None and again.shape == (20, 24, 3)


def test_grain_matches_thread_iterator(tmp_path, rng):
    """The grain pipeline yields the SAME collated batch sequence as the
    thread prefetcher when shuffle is off (same indices, same collate), so
    the two paths are interchangeable under the trainer."""
    pytest.importorskip("grain")
    from attwarp_tpu.data.grain_pipeline import grain_available, make_grain_iterator

    assert grain_available()
    gqa = _make_root(tmp_path, "g4", 5, rng)
    ds = FullDataset(gqa, gqa, gqa, num_samples_per_dataset=4, image_size=32,
                     random_seed=1)
    idx = list(range(len(ds)))
    thread = list(batch_iterator(ds, idx, batch_size=4, shuffle=False))
    grain_b = list(make_grain_iterator(ds, idx, batch_size=4, shuffle=False))
    assert len(thread) == len(grain_b) == 3
    for tb, gb in zip(thread, grain_b):
        np.testing.assert_array_equal(tb["image"], gb["image"])
        np.testing.assert_array_equal(tb["attention_map"], gb["attention_map"])
        np.testing.assert_array_equal(tb["sqrt_mask"], gb["sqrt_mask"])
        assert tb["q_str"] == gb["q_str"] and tb["answer"] == gb["answer"]


def test_grain_shuffle_deterministic_and_complete(tmp_path, rng):
    """Seeded grain shuffle: two runs identical; every sample appears once
    per epoch; a different seed gives a different order."""
    pytest.importorskip("grain")
    from attwarp_tpu.data.grain_pipeline import make_grain_iterator

    gqa = _make_root(tmp_path, "g5", 5, rng)
    ds = FullDataset(gqa, gqa, gqa, num_samples_per_dataset=4, image_size=32,
                     random_seed=1)
    idx = list(range(len(ds)))

    def qs(seed):
        out = []
        for b in make_grain_iterator(ds, idx, 4, shuffle=True, seed=seed,
                                     drop_last=False):
            out.extend(b["q_str"])
        return out

    a, b, c = qs(7), qs(7), qs(8)
    assert a == b
    assert sorted(a) == sorted(qs(8))  # same multiset, every sample once
    assert a != c


def test_grain_multi_host_sharding(tmp_path, rng):
    """host_local_indices + grain compose into disjoint, complete per-host
    streams (the multi-host input sharding contract)."""
    pytest.importorskip("grain")
    from attwarp_tpu.data.grain_pipeline import make_grain_iterator
    from attwarp_tpu.data.loader import host_local_indices

    gqa = _make_root(tmp_path, "g6", 6, rng)
    ds = FullDataset(gqa, gqa, gqa, num_samples_per_dataset=4, image_size=32,
                     random_seed=1)
    idx = list(range(len(ds)))
    seen = []
    for host in range(2):
        local = host_local_indices(idx, process_index=host, process_count=2)
        assert len(local) == 6
        for b in make_grain_iterator(ds, local, 3, shuffle=False):
            seen.extend(b["q_str"])
    all_q = [ds[i]["question"] for i in idx]
    assert sorted(seen) == sorted(all_q)  # disjoint + complete


def test_make_batch_iterator_selection(tmp_path, rng):
    """pipeline='auto' uses grain when installed; 'thread' forces the
    prefetcher; unknown names are rejected."""
    from attwarp_tpu.data.loader import make_batch_iterator

    gqa = _make_root(tmp_path, "g7", 5, rng)
    ds = FullDataset(gqa, gqa, gqa, num_samples_per_dataset=4, image_size=32,
                     random_seed=1)
    idx = list(range(len(ds)))
    t = list(make_batch_iterator(ds, idx, 4, pipeline="thread"))
    a = list(make_batch_iterator(ds, idx, 4, pipeline="auto"))
    assert len(t) == len(a) == 3
    np.testing.assert_array_equal(t[0]["image"], a[0]["image"])
    with pytest.raises(ValueError, match="pipeline"):
        make_batch_iterator(ds, idx, 4, pipeline="torch")


def test_progress_manifest_thread_safety(tmp_path):
    """Race detection for the driver's resume manifest: concurrent mark()
    from the producer thread and save() from the writer thread (the
    process_dataset layout) must lose no updates and persist a consistent
    count (the unlocked version dropped increments under contention)."""
    import threading

    p = str(tmp_path / "progress.json")
    m = ProgressManifest(p)
    N, T = 200, 4

    def worker(t):
        for i in range(t, N, T):
            m.mark(i, failed=(i % 7 == 0))
            if i % 13 == 0:
                m.save()

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(T)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    m.save()
    re = ProgressManifest(p)
    assert re.processed_count + re.failed_count == N
    assert re.remaining(N) == []


def test_progress_manifest_roundtrip(tmp_path):
    p = str(tmp_path / "progress.json")
    m = ProgressManifest(p)
    assert m.remaining(5) == [0, 1, 2, 3, 4]
    m.mark(0)
    m.mark(2, failed=True)
    m2 = ProgressManifest(p)
    assert m2.processed_count == 1 and m2.failed_count == 1
    assert m2.remaining(5) == [1, 3, 4]
    assert m2.last_processed_internal_idx == 2
    m2.mark_many([1, 3, 4])
    m3 = ProgressManifest(p)
    assert m3.remaining(5) == []


def test_textvqa_reader(tmp_path, rng):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray((rng.random((20, 20, 3)) * 255).astype(np.uint8)).save(img_dir / "img1.jpg")
    data = {
        "dataset_type": "textvqa",
        "dataset_name": "TextVQA",
        "dataset_version": "0.5.1",
        "data": [
            {"image_id": "img1", "question": "what?", "answers": ["x"] * 10},
            {"image_id": "missing", "question": "huh?", "answers": ["y"] * 10},
        ],
    }
    jp = tmp_path / "tv.json"
    jp.write_text(json.dumps(data))
    ds = TextVQADataset(str(jp), str(img_dir))
    assert len(ds) == 2
    assert ds[0]["loaded_image"] is not None
    assert ds[0]["loaded_image"].shape == (20, 20, 3)
    assert ds[1]["loaded_image"] is None

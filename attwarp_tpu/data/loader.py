"""Batching and collation for training.

Collation parity with ``data.py:10-24`` (string fields pass through as
lists), extended with the numeric transform masks the jitted train step
consumes (the reference computes them inside the hot loop from strings —
trainer.py:177-194 — which cannot trace; we precompute them host-side).

A one-deep background-thread prefetcher overlaps host data work with device
steps (the TPU equivalent of DataLoader workers).
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from attwarp_tpu.data.manifests import load_gqa_transform_map, transform_for_sample


def collate(items: Sequence[Dict]) -> Dict:
    """Stack numeric fields; pass strings through; add sqrt/none masks."""
    mapping = load_gqa_transform_map()
    tfms = [
        transform_for_sample(b.get("dataset"), b.get("bucket"), mapping)
        for b in items
    ]
    out = {
        "image": np.stack([b["image"] for b in items]).astype(np.float32),
        "attention_map": np.stack([b["attention_map"] for b in items]).astype(np.float32),
        "q_str": [b["question"] for b in items],
        "answer": [b.get("answer", "") for b in items],
        "dataset": [b.get("dataset") for b in items],
        "bucket": [b.get("bucket") for b in items],
        "sqrt_mask": np.asarray([1.0 if t == "sqrt" else 0.0 for t in tfms], np.float32),
        "none_mask": np.asarray([1.0 if t == "none" else 0.0 for t in tfms], np.float32),
    }
    return out


def split_indices(n: int, val_frac: float, seed: int):
    """Seeded 90/10-style split (trainer.py:75-81)."""
    idx = list(range(n))
    random.Random(seed).shuffle(idx)
    n_val = n - int((1.0 - val_frac) * n)
    return idx[: n - n_val], idx[n - n_val :]


def host_local_indices(
    indices: Sequence[int],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[int]:
    """Multi-host input sharding: each host reads a disjoint strided slice of
    the index list (data flows over DCN only in the input pipeline — the
    device mesh never moves raw images across hosts)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(indices)[pi::pc]


def batch_iterator(
    dataset,
    indices: Sequence[int],
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    prefetch: int = 2,
) -> Iterator[Dict]:
    """Yield collated batches with background prefetch."""
    order = list(indices)
    if shuffle:
        random.Random(seed).shuffle(order)
    n = len(order)
    batches: List[List[int]] = []
    start = 0
    while start < n:
        end = min(start + batch_size, n)
        if end - start < batch_size and drop_last:
            break
        batches.append(order[start:end])
        start = end

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    stop = object()

    def producer():
        try:
            for b in batches:
                q.put(collate([dataset[i] for i in b]))
            q.put(stop)
        except BaseException as e:  # propagate — a swallowed loader error
            q.put(e)                # would silently truncate every epoch

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def make_batch_iterator(
    dataset,
    indices: Sequence[int],
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    pipeline: str = "auto",
) -> Iterator[Dict]:
    """Select the input pipeline: ``"grain"`` (grain-backed, worker-ready),
    ``"thread"`` (the in-process prefetcher above), or ``"auto"`` (grain when
    importable, else thread). Both yield the same collated batch dicts; with
    ``shuffle=False`` the batch sequences are identical
    (tests/test_data.py::test_grain_matches_thread_iterator)."""
    from attwarp_tpu.data.grain_pipeline import grain_available

    if pipeline not in ("auto", "grain", "thread"):
        raise ValueError(f"unknown data pipeline {pipeline!r}")
    use_grain = pipeline == "grain" or (pipeline == "auto" and grain_available())
    if use_grain:
        from attwarp_tpu.data.grain_pipeline import make_grain_iterator

        return make_grain_iterator(
            dataset, indices, batch_size,
            shuffle=shuffle, seed=seed, drop_last=drop_last,
        )
    return batch_iterator(
        dataset, indices, batch_size,
        shuffle=shuffle, seed=seed, drop_last=drop_last,
    )

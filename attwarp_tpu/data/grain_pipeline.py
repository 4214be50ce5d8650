"""Grain-backed input pipeline (optional).

The idiomatic TPU input pipeline: wraps any indexable dataset (FullDataset,
MixedMetadataDataset) in a ``grain.MapDataset`` with deterministic seeded
shuffling, multi-host sharding, batching through the framework's collate,
and worker prefetch. Falls back cleanly if grain is not installed — the
thread-prefetch ``batch_iterator`` covers that case.
"""

from __future__ import annotations

from typing import Iterator, Sequence


def grain_available() -> bool:
    try:
        import grain  # noqa: F401

        return True
    except Exception:
        return False


def make_grain_iterator(
    dataset,
    indices: Sequence[int],
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    num_workers: int = 0,
    num_epochs: int = 1,
) -> Iterator[dict]:
    """Yield collated batches via grain. ``indices`` selects (and orders) the
    samples, so train/val splits and multi-host sharding compose upstream
    (see ``loader.split_indices`` / ``loader.host_local_indices``)."""
    import grain.python as grain

    from attwarp_tpu.data.loader import collate

    class _View:
        def __init__(self, ds, idx):
            self.ds = ds
            self.idx = list(idx)

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            return self.ds[self.idx[i]]

    view = _View(dataset, indices)
    ds = grain.MapDataset.source(view)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    ds = ds.batch(batch_size, drop_remainder=drop_last, batch_fn=lambda xs: collate(xs))
    it = ds.repeat(num_epochs) if num_epochs != 1 else ds
    if num_workers and num_workers > 0:
        it = it.to_iter_dataset().prefetch(num_workers)
    return iter(it)

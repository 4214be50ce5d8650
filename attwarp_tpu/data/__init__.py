"""Data pipelines: manifest-driven datasets, TextVQA reader, resumable
pipeline progress, batching."""

from attwarp_tpu.data.manifests import (
    GQA_CATEGORY_TO_TRANSFORM,
    FullDataset,
    MixedMetadataDataset,
    load_gqa_transform_map,
    select_artifact,
    transform_for_sample,
)
from attwarp_tpu.data.progress import ProgressManifest
from attwarp_tpu.data.textvqa import TextVQADataset
from attwarp_tpu.data.loader import batch_iterator, collate

__all__ = [
    "GQA_CATEGORY_TO_TRANSFORM",
    "FullDataset",
    "MixedMetadataDataset",
    "select_artifact",
    "transform_for_sample",
    "load_gqa_transform_map",
    "ProgressManifest",
    "TextVQADataset",
    "batch_iterator",
    "collate",
]

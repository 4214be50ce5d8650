"""Evaluation: VQA text normalization/scoring, accuracy harness, ablation
metrics."""

from attwarp_tpu.eval.vqa_text import (
    calculate_vqa_accuracy,
    get_acc,
    process_text,
)
from attwarp_tpu.eval.ablation import am_all, interpret_bbox, top1
from attwarp_tpu.eval.harness import evaluate_textvqa_accuracy

__all__ = [
    "process_text",
    "get_acc",
    "calculate_vqa_accuracy",
    "interpret_bbox",
    "top1",
    "am_all",
    "evaluate_textvqa_accuracy",
]

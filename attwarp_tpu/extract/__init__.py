"""Attention extraction from MLLM decode loops — without hooks.

The reference registers PyTorch forward hooks on one decoder layer and
monkey-patches its forward to force attention outputs
(``attention_extraction/llava.py:141-147,422-438``). On TPU the decode loop
is a ``lax.scan``; the designated layer simply *returns* the attention row of
the current token over the image-token span, and the scan carry accumulates
it (``attwarp_tpu.extract.accumulator``) — functionally identical to
``MaskHookLogger._process_attention`` (llava.py:93-116) with zero graph
surgery.
"""

from attwarp_tpu.extract.accumulator import (
    AttnCarry,
    accumulate_step,
    finalize,
    init_carry,
    slice_and_pool_attention,
)
from attwarp_tpu.extract.offsets import (
    batch_image_token_ranges,
    expanded_length,
)
from attwarp_tpu.extract.extraction import extract_attention, llava_api
from attwarp_tpu.extract.prompts import build_prompt, infer_conv_mode

__all__ = [
    "AttnCarry",
    "init_carry",
    "accumulate_step",
    "finalize",
    "slice_and_pool_attention",
    "batch_image_token_ranges",
    "expanded_length",
    "extract_attention",
    "llava_api",
    "build_prompt",
    "infer_conv_mode",
]

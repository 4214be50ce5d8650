"""Model families.

- ``llama``    — LLaMA decoder (RMSNorm, RoPE, GQA, SwiGLU) with functional
  per-layer attention-row extraction.
- ``clip_vit`` — CLIP vision tower (pre-LN ViT) as used by LLaVA-1.5.
- ``llava``    — the combined multimodal model + HF weight porting; the L1
  runtime the reference delegates to the vendored LLaVA repo
  (SURVEY §1 L1; attwarp.yaml:56).
- ``mini``     — the small self-contained test backend lives in
  ``attwarp_tpu.extract.mini_llava`` (re-exported here).
"""

from attwarp_tpu.models.llama import LlamaConfig, llama_decode_step, llama_prefill
from attwarp_tpu.models.clip_vit import ClipVisionConfig, clip_vision_features
from attwarp_tpu.models.llava import (
    LlavaConfig,
    LlavaModel,
    port_hf_llava_weights,
)
from attwarp_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    Qwen2VLModel,
    port_hf_qwen2vl_weights,
)
from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig  # noqa: F401

__all__ = [
    "LlamaConfig",
    "llama_prefill",
    "llama_decode_step",
    "ClipVisionConfig",
    "clip_vision_features",
    "LlavaConfig",
    "LlavaModel",
    "port_hf_llava_weights",
    "Qwen2VLConfig",
    "Qwen2VLModel",
    "port_hf_qwen2vl_weights",
    "MiniLLaVAConfig",
]

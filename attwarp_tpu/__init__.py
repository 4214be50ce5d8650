"""attwarp_tpu — a TPU-native (JAX / XLA / Pallas) framework for
attention-guided image warping ("Constructive Distortion", arXiv:2510.09741).

This is a ground-up TPU-first re-design of the capabilities of the
dwipddalal/AttWarp reference (PyTorch + NumPy + OpenCV):

- ``attwarp_tpu.numerics``    — PDF/CDF math, adaptive pooling, right-inverse
  upsampling, safe softmax, losses (reference:
  ``model/marginalnet_full_dataset/checkpoint_utils.py``, ``losses.py``).
- ``attwarp_tpu.warp``        — the warp engine: attention transforms,
  marginal→CDF→inverse-grid construction, separable bilinear resampling
  (reference: ``Attention Guided Warping/new_method.py:198-283`` and
  ``checkpoint_utils.py:133-204``), mask blending (``attention_extraction/
  llava.py:195-270``), and a fused Pallas fast path.
- ``attwarp_tpu.extract``     — hook-free attention extraction from a JAX MLLM
  decode loop (reference: ``attention_extraction/{functions,llava}.py``).
- ``attwarp_tpu.marginalnet`` — the FiLM-conditioned MarginalNet in Flax
  (reference: ``model/marginalnet_full_dataset/model.py``).
- ``attwarp_tpu.train``       — jit-compiled data-parallel training over a
  device mesh (reference: ``model/marginalnet_full_dataset/trainer.py``).
- ``attwarp_tpu.data``        — manifest-driven datasets + resumable pipeline
  progress (reference: ``dataloader.py``, ``main.py:185-200``).
- ``attwarp_tpu.eval``        — VQA text normalization + accuracy harness
  (reference: ``Attention Guided Warping/evaluate_accuracy.py``).

Everything on the compute path is functional, jit/vmap-safe, and static-shape;
there is no mutable module-global state (the reference's
``new_method.py:378-403`` transform globals become explicit parameters).
"""

__version__ = "0.1.0"

# Lazy top-level convenience exports (kept lazy so `import attwarp_tpu`
# stays cheap and doesn't pull in jax before the caller configures it).
_LAZY = {
    "AttWarpPipeline": ("attwarp_tpu.pipeline", "AttWarpPipeline"),
    "warp_batch_by_attention": ("attwarp_tpu.warp", "warp_batch_by_attention"),
    "warp_image_by_attention": ("attwarp_tpu.warp", "warp_image_by_attention"),
    "warp_from_cdf": ("attwarp_tpu.warp", "warp_from_cdf"),
    "WarpParams": ("attwarp_tpu.warp", "WarpParams"),
    "Transform": ("attwarp_tpu.warp", "Transform"),
    "mota_mask": ("attwarp_tpu.warp", "mota_mask"),
    "MarginalNet": ("attwarp_tpu.marginalnet", "MarginalNet"),
    "predict_and_warp": ("attwarp_tpu.marginalnet", "predict_and_warp"),
    "llava_api": ("attwarp_tpu.extract", "llava_api"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'attwarp_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))

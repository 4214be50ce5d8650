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

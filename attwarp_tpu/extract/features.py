"""Frozen-MLLM feature extraction for MarginalNet training.

The reference imports a (missing-at-snapshot) ``LLava_loader.LLaVAFeatHelper``
whose call signatures define the contract (trainer.py:17,103,110-112,206-207):

    visual_tokens(img)  -> (B, Dv, hv, wv)     [torch NCHW]
    text_tokens(texts)  -> (ttok (B, Lt, Dt), tmask (B, Lt, 1))

The TPU contract is the same in NHWC: ``visual_tokens -> (B, hv, wv, Dv)``.
``MiniFeatureExtractor`` implements it from the MiniLLaVA test backend; a
real-weights extractor plugs in the same way.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.extract.mini_llava import MiniLLaVAConfig, encode_image


class MiniFeatureExtractor:
    """Frozen features from the MiniLLaVA test backend."""

    def __init__(self, backend):
        self.backend = backend
        self.cfg: MiniLLaVAConfig = backend.cfg
        self._vis = jax.jit(
            jax.vmap(lambda im: encode_image(backend.params, self.cfg, im))
        )

    def visual_tokens(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float -> (B, hv, wv, Dv) NHWC patch features."""
        B = images.shape[0]
        size = self.cfg.image_size
        if images.shape[1] != size or images.shape[2] != size:
            images = jax.image.resize(
                images, (B, size, size, images.shape[3]), method="linear"
            )
        toks = self._vis(jnp.asarray(images, jnp.float32))  # (B, n*n, D)
        n = self.cfg.num_patches
        return toks.reshape(B, n, n, -1)

    def text_tokens(
        self, texts: Sequence[str], max_len: int = 32
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """list[str] -> (ttok (B, Lt, Dt), tmask (B, Lt, 1)).

        Always padded to the fixed ``max_len`` so every training batch has
        the same text shape — per-batch max-length padding would recompile
        the jitted train step for each distinct question length."""
        ids = [self.backend.tokenizer.encode(t)[:max_len] for t in texts]
        ids = [[self.cfg.pad_id] * (max_len - len(t)) + t for t in ids]
        mask = [[1.0 if tok != self.cfg.pad_id else 0.0 for tok in t] for t in ids]
        ids_arr = jnp.asarray(np.asarray(ids, np.int64).clip(0))
        emb = self.backend.params["tok_emb"][ids_arr]
        return emb, jnp.asarray(np.asarray(mask, np.float32))[..., None]


class LlavaFeatureExtractor:
    """Frozen features from a real (HF-ported) LLaVA backend — the contract
    of the reference's missing ``LLaVAFeatHelper`` with actual weights:
    visual tokens are the CLIP tower's pre-projection features (B, 24, 24,
    Dv), text tokens the LLaMA input embeddings of the question."""

    def __init__(self, backend, max_text_len: int = 32):
        from attwarp_tpu.models.clip_vit import clip_vision_features

        self.backend = backend
        self.max_text_len = max_text_len
        cfg = backend.model.cfg

        def _vis(pixels):
            return clip_vision_features(
                backend.model.params["vision"], cfg.vision, pixels,
                feature_layer=cfg.vision_feature_layer, drop_cls=True,
            )

        self._vis = jax.jit(_vis)

    def visual_tokens(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float [0,1] -> (B, n, n, Dv)."""
        pixels = jnp.stack(
            [jnp.asarray(self.backend._preprocess(np.asarray(im))) for im in images]
        )
        toks = self._vis(pixels)  # (B, n*n, Dv)
        n = self.backend.num_patches_side
        return toks.reshape(toks.shape[0], n, n, -1)

    def text_tokens(self, texts: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.backend.tokenizer is None:
            raise RuntimeError("LlavaFeatureExtractor needs a tokenizer (from_hf)")
        L = self.max_text_len
        ids, mask = [], []
        for t in texts:
            toks = self.backend.tokenizer(t, add_special_tokens=True)["input_ids"][:L]
            pad = L - len(toks)
            ids.append([0] * pad + toks)
            mask.append([0.0] * pad + [1.0] * len(toks))
        emb = self.backend.model.params["llama"]["embed_tokens"][
            jnp.asarray(np.asarray(ids, np.int64).clip(0))
        ]
        return emb, jnp.asarray(np.asarray(mask, np.float32))[..., None]


class Qwen2VLFeatureExtractor:
    """Frozen features from a Qwen2-VL backend (the reference's training
    artifacts are Qwen-produced — dataset roots ``*_qwen_multilayer``):
    visual tokens are the merged vision features reshaped to the merged
    grid; text tokens the Qwen input embeddings."""

    def __init__(self, backend, max_text_len: int = 32):
        from attwarp_tpu.models.qwen2vl import (
            patchify_image,
            qwen2vl_vision_features,
        )

        self.backend = backend
        self.max_text_len = max_text_len
        self._patchify = patchify_image
        self._features = qwen2vl_vision_features

    def visual_tokens(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float [0,1] -> (B, n, n, D) merged vision features."""
        n = self.backend.num_patches_side
        vcfg = self.backend.model.cfg.vision
        outs = []
        for b in range(images.shape[0]):
            img = self.backend._preprocess(np.asarray(images[b]))
            patches, grid = self._patchify(img, vcfg)
            feats = self._features(
                self.backend.model.params["vision"], vcfg,
                jnp.asarray(patches), (grid[1], grid[2]),
            )
            outs.append(feats.reshape(n, n, -1))
        return jnp.stack(outs)

    def text_tokens(self, texts: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.backend.tokenizer is None:
            raise RuntimeError("Qwen2VLFeatureExtractor needs a tokenizer")
        L = self.max_text_len
        ids, mask = [], []
        for t in texts:
            toks = self.backend.tokenizer(t, add_special_tokens=False)["input_ids"][:L]
            pad = L - len(toks)
            ids.append([0] * pad + toks)
            mask.append([0.0] * pad + [1.0] * len(toks))
        emb = self.backend.model.params["text"]["embed_tokens"][
            jnp.asarray(np.asarray(ids, np.int64).clip(0))
        ]
        return emb, jnp.asarray(np.asarray(mask, np.float32))[..., None]


def make_feature_extractor(cfg):
    """Build the frozen-feature extractor named by ``cfg.mllm_backend``
    ('mini' = test backend; 'llava'/'llava-flax' or 'qwen2vl' = real HF
    checkpoint via ``cfg.mllm_model``). Unknown names raise instead of
    silently training against random features."""
    name = str(cfg.mllm_backend).lower()
    if name == "mini":
        from attwarp_tpu.extract.extraction import MiniLLaVABackend

        return MiniFeatureExtractor(MiniLLaVABackend())
    if name in ("llava", "llava-flax"):
        from attwarp_tpu.extract.llava_backend import LlavaBackend

        return LlavaFeatureExtractor(LlavaBackend.from_hf(cfg.mllm_model))
    if name in ("qwen2vl", "qwen2-vl", "qwen"):
        from attwarp_tpu.extract.qwen2vl_backend import Qwen2VLBackend

        return Qwen2VLFeatureExtractor(Qwen2VLBackend.from_hf(cfg.mllm_model))
    raise ValueError(f"unknown mllm_backend {cfg.mllm_backend!r}")

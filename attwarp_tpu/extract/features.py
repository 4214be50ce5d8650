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
from attwarp_tpu.extract.offsets import left_pad


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
        """list[str] -> (ttok (B, Lt, Dt), tmask (B, Lt, 1))."""
        ids = [self.backend.tokenizer.encode(t)[:max_len] for t in texts]
        padded, mask = left_pad(ids, pad_id=self.cfg.pad_id)
        ids_arr = jnp.asarray(np.asarray(padded, np.int64).clip(0))
        emb = self.backend.params["tok_emb"][ids_arr]
        return emb, jnp.asarray(np.asarray(mask, np.float32))[..., None]

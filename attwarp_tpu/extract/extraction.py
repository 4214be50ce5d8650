"""User-facing attention-extraction API.

- ``extract_attention``: the ``getmask`` / ``getmask_batch`` equivalent
  (functions.py:46-186, 188-328) — one batched call covers both.
- ``llava_api``: the one-call convenience of the reference
  (llava.py:272-331): (images, questions) -> (overlays, attention maps
  (B,1,24,24), mota masks).

Backends are duck-typed: anything exposing ``image_size`` and
``extract(images, questions, max_new_tokens)`` works; ``MiniLLaVABackend``
is the self-contained test backend,
``attwarp_tpu.extract.llava_backend.LlavaBackend`` the real-weights one.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.extract.mini_llava import (
    HashTokenizer,
    MiniLLaVAConfig,
    build_spliced_embeds,
    generate_with_attention,
    init_params,
)
from attwarp_tpu.extract.offsets import left_pad
from attwarp_tpu.extract.prompts import build_prompt, stop_str_for


class MiniLLaVABackend:
    """Self-contained test MLLM (no external weights)."""

    # extract() takes any (B, H, W, 3) array, device-resident included —
    # lets tests exercise the pipeline/driver device-pixels path on CPU
    supports_device_pixels = True

    def __init__(self, cfg: Optional[MiniLLaVAConfig] = None, seed: int = 0):
        self.cfg = cfg or MiniLLaVAConfig()
        self.params = init_params(self.cfg, jax.random.PRNGKey(seed))
        self.tokenizer = HashTokenizer(self.cfg)
        self.conv_mode = "llava_v1"

    @property
    def image_size(self) -> int:
        return self.cfg.image_size

    @property
    def num_patches_side(self) -> int:
        return self.cfg.num_patches  # mini's num_patches is per side (n×n grid)

    def extract(
        self,
        images: np.ndarray,      # (B, H, W, 3) float in [0,1] or uint8
        questions: Sequence[str],
        max_new_tokens: int = 20,
    ) -> Tuple[np.ndarray, List[str]]:
        """(attention maps (B, 24, 24), decoded answers)."""
        prompts = [build_prompt(q, self.conv_mode) for q in questions]
        ids = [self.tokenizer.encode(p) for p in prompts]
        # bucket=8 keeps the tiny test model's shapes small but still
        # exercises the one-compile-per-bucket behavior of the real backend
        padded, _mask = left_pad(ids, pad_id=self.cfg.pad_id, bucket=8)
        padded = np.asarray(padded, np.int64)
        imgs = jnp.asarray(images, jnp.float32)
        if imgs.ndim == 3:
            imgs = imgs[None]
        embeds, pos_mask, img_start = build_spliced_embeds(
            self.params, self.cfg, padded, imgs
        )
        if embeds.shape[1] + max_new_tokens > self.cfg.max_seq:
            raise ValueError(
                f"prompt too long: expanded length {embeds.shape[1]} + "
                f"{max_new_tokens} new tokens exceeds max_seq={self.cfg.max_seq} "
                "(the KV cache would silently clamp writes)"
            )
        gen, maps = generate_with_attention(
            self.params, self.cfg, embeds, pos_mask, img_start,
            max_new_tokens=max_new_tokens,
        )
        gen = np.asarray(gen)
        stop = stop_str_for(self.conv_mode)
        texts = []
        for row in gen:
            ids_out = []
            for t in row:
                if int(t) == self.cfg.eos_id:
                    break
                ids_out.append(int(t))
            text = self.tokenizer.decode(ids_out).strip()
            if text.endswith(stop):
                text = text[: -len(stop)].strip()
            texts.append(text)
        return np.asarray(maps), texts


def extract_attention(
    backend,
    images: np.ndarray,
    questions: Sequence[str],
    max_new_tokens: int = 20,
) -> Tuple[np.ndarray, List[str]]:
    """getmask/getmask_batch equivalent: returns ((B, 24, 24) maps, texts)."""
    return backend.extract(images, questions, max_new_tokens=max_new_tokens)


def llava_api(
    images: Sequence[np.ndarray],
    queries: Sequence[str],
    backend=None,
    batch_size: int = 1,
    enhance_coe: float = 10.0,
    kernel_size: int = 3,
    grayscale: float = 0.0,
    max_new_tokens: int = 20,
):
    """One-call convenience API (reference llava.py:272-331).

    Returns (masked_images, attention_maps, mota_masks): overlay RGB arrays,
    (1, 1, 24, 24) float maps, and image-size uint8 MOTA masks.
    """
    from attwarp_tpu.warp.blend import blend_mask

    backend = backend or MiniLLaVABackend()
    masked_images, attention_maps, mota_masks = [], [], []
    n = len(images)
    for i in range(0, n, max(batch_size, 1)):
        chunk_imgs = list(images[i : i + batch_size])
        chunk_qs = list(queries[i : i + batch_size])
        batch = np.stack(
            [_resize_for_backend(im, backend.image_size) for im in chunk_imgs]
        )
        maps, _texts = extract_attention(
            backend, batch, chunk_qs, max_new_tokens=max_new_tokens
        )
        maps = np.asarray(maps)
        if maps.ndim == 4:  # multi-layer backend: first listed layer is primary
            maps = maps[0]
        for im, m in zip(chunk_imgs, maps):
            im8 = _to_uint8_rgb(im)
            overlay, mota = blend_mask(
                im8, jnp.asarray(m), enhance_coe, kernel_size, grayscale
            )
            masked_images.append(overlay)
            attention_maps.append(np.asarray(m)[None, None])  # (1,1,24,24)
            mota_masks.append(mota)
    return masked_images, attention_maps, mota_masks


def _to_uint8_rgb(im: np.ndarray) -> np.ndarray:
    im = np.asarray(im)
    if im.dtype == np.uint8:
        return im
    # float input: [0, 1] convention (integer dtypes are 0-255)
    if np.issubdtype(im.dtype, np.integer):
        return np.clip(im, 0, 255).astype(np.uint8)
    return np.clip(np.rint(im * 255.0), 0, 255).astype(np.uint8)


def _resize_for_backend(im: np.ndarray, size: int) -> np.ndarray:
    """Normalize to float [0, 1] by DTYPE (a max()-based heuristic
    misclassifies dark uint8 images) and resize to the backend input."""
    arr = np.asarray(im)
    if np.issubdtype(arr.dtype, np.integer):
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:  # float array carrying 0-255 values
            arr = arr / 255.0
    if arr.shape[0] == size and arr.shape[1] == size:
        return arr
    out = jax.image.resize(jnp.asarray(arr), (size, size, arr.shape[2]), method="linear")
    return np.asarray(out)


def _to01_scale(arr: np.ndarray) -> float:
    """The `_resize_for_backend` dtype rule as a multiplier to [0, 1]."""
    if np.issubdtype(arr.dtype, np.integer):
        return 1.0 / 255.0
    return 1.0 / 255.0 if float(arr.max()) > 1.5 else 1.0


@partial(jax.jit, static_argnames=("out_hw",))
def resize_scale_device(batch: jnp.ndarray, scale, out_hw) -> jnp.ndarray:
    """``batch (B, H, W, C)`` any dtype -> float32, scaled by ``scale`` and
    bilinearly resized to ``out_hw`` — one fused device program. The
    device-resident analogue of `_resize_for_backend` (whose per-image
    host round trips cost seconds per batch through a remote-device link)."""
    x = batch.astype(jnp.float32) * scale
    if x.shape[1:3] == tuple(out_hw):
        return x
    return jax.image.resize(
        x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]), method="linear"
    )


def resize_images_batch(images: Sequence[np.ndarray], size: int) -> jnp.ndarray:
    """Device-batched `_resize_for_backend`: one upload + ONE resize
    dispatch per distinct (shape, scale) group instead of two host-device
    round trips per image. Returns ``(B, size, size, C)`` float32 in
    [0, 1] ON DEVICE, in input order."""
    arrs = [np.asarray(im) for im in images]
    groups: dict = {}
    for i, a in enumerate(arrs):
        groups.setdefault((a.shape, _to01_scale(a)), []).append(i)
    pieces, order = [], []
    for (shape, scale), idxs in groups.items():
        batch = jax.device_put(np.stack([arrs[i] for i in idxs]))
        pieces.append(resize_scale_device(batch, jnp.float32(scale), (size, size)))
        order.extend(idxs)
    if len(pieces) == 1:
        return pieces[0]
    return jnp.concatenate(pieces, axis=0)[jnp.asarray(np.argsort(order))]

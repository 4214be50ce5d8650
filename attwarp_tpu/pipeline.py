"""The AttWarp two-pass pipeline as a single API.

The paper's full flow (reference ``new_method.py`` example_workflow + main +
second pass, :30-130, :508-615): run the MLLM once to extract the
question-conditioned attention, build the MOTA mask, warp the image so
attended regions are magnified, and run the MLLM again on the warped image
for the final answer.

    from attwarp_tpu.pipeline import AttWarpPipeline
    pipe = AttWarpPipeline(backend)            # any extraction backend
    result = pipe.run(images, questions)       # batched end to end
    result.second_answers                      # answers on warped images

Everything between the two MLLM passes (mask enhancement, marginals, CDF,
grid, resample) is batched jnp on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from functools import partial

import jax

from attwarp_tpu.warp.blend import mota_mask
from attwarp_tpu.warp.transforms import Transform, WarpParams
from attwarp_tpu.warp.warp import warp_batch_by_attention


@partial(
    jax.jit,
    static_argnames=("out_hw", "S", "enhance_coe", "kernel_size", "quantize",
                     "params"),
)
def _mask_warp_fused(maps, imgs255, out_hw, S, enhance_coe, kernel_size,
                     quantize, params):
    """MOTA masks for a whole shape group plus the batched warp in ONE
    device program: no image-size mask ever crosses the host boundary on
    the way to the warp."""
    masks = jax.vmap(
        lambda a: mota_mask(a, out_hw, enhance_coe=enhance_coe,
                            kernel_size=kernel_size,
                            quantize_like_reference=quantize)
    )(maps)
    warped = warp_batch_by_attention(
        imgs255, masks.astype(jnp.float32), S, S, params
    )
    return masks, warped


def _to_float255(im) -> np.ndarray:
    """Dtype-aware scaling to float [0, 255] (integer dtypes are already
    0-255; floats follow the [0,1] convention unless clearly 0-255)."""
    arr = np.asarray(im)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.float32)
    arr = arr.astype(np.float32)
    return arr if arr.max() > 1.5 else arr * 255.0


@dataclass
class AttWarpResult:
    warped: np.ndarray               # (B, H, W, 3) float32
    attention_maps: np.ndarray       # (B, n, n) raw extracted maps
    mota_masks: List[np.ndarray]     # per-sample (H, W) uint8 masks
    first_answers: List[str]         # answers from the extraction pass
    second_answers: Optional[List[str]] = None  # answers on warped images


@dataclass
class AttWarpPipeline:
    """backend: duck-typed extraction backend (``image_size``, ``extract``).

    ``warp_size``: output H=W of the warped image (the drivers' 500 default);
    ``enhance_coe``/``kernel_size``: MOTA mask parameters;
    ``transform``: attention transform for the warp.
    """

    backend: object
    warp_size: int = 500
    enhance_coe: float = 10.0
    kernel_size: int = 3
    transform: Transform = Transform.IDENTITY
    exp_scale: float = 1.0
    exp_divisor: float = 1.0
    apply_inverse: bool = False
    max_new_tokens: int = 20
    second_pass: bool = True
    quantize_like_reference: bool = True
    # Dynamic image sizes are the reference's native mode but hostile to XLA
    # (one compilation per distinct shape — SURVEY §7 'hard parts'). With
    # size_bucket > 0 each image is bilinearly resized so H and W round up
    # to the bucket multiple (capped at max_side), bounding the number of
    # compiled shapes. 0 = warp at exact native sizes.
    size_bucket: int = 64
    max_side: int = 1024
    # Keep pixels ON DEVICE between phases (preprocess, mask+warp fused in
    # one program per shape group, warped fed straight into pass 2) when the
    # backend supports device pixels. Through a remote-device link each
    # avoided host round trip is worth hundreds of ms; the math is identical
    # to the host path (same resize kernel, same mask/warp programs).
    device_resident: bool = True
    params: WarpParams = field(init=False)

    def __post_init__(self):
        self.params = WarpParams(
            transform=self.transform,
            exp_scale=self.exp_scale,
            exp_divisor=self.exp_divisor,
            apply_inverse_to_marginals=self.apply_inverse,
        )

    def run(
        self, images: Sequence[np.ndarray], questions: Sequence[str]
    ) -> AttWarpResult:
        from attwarp_tpu.extract.extraction import _resize_for_backend

        if len(images) != len(questions):
            raise ValueError(
                f"{len(images)} images but {len(questions)} questions"
            )
        if self.device_resident and getattr(
            self.backend, "supports_device_pixels", False
        ):
            return self._run_device(images, questions)
        batch_in = np.stack(
            [_resize_for_backend(im, self.backend.image_size) for im in images]
        )

        # pass 1: extraction (MLLM decode with scan-carried accumulation)
        maps, first_answers = self.backend.extract(
            batch_in, list(questions), max_new_tokens=self.max_new_tokens
        )
        maps = np.asarray(maps)
        if maps.ndim == 4:  # multi-layer backend: first listed layer is primary
            maps = maps[0]

        # mask + warp at native resolution; dtype-aware [0,255] scaling
        # (max()-based heuristics misclassify dark images), batched per
        # distinct (H, W) group so same-sized images share one dispatch
        S = self.warp_size
        imgs255 = [self._bucket_size(_to_float255(im)) for im in images]
        masks: List[Optional[np.ndarray]] = [None] * len(images)
        warped = np.empty((len(images), S, S, 3), np.float32)
        groups: dict = {}
        for b, im_arr in enumerate(imgs255):
            H, W = im_arr.shape[:2]
            masks[b] = np.asarray(
                mota_mask(
                    jnp.asarray(maps[b], jnp.float32), (H, W),
                    enhance_coe=self.enhance_coe, kernel_size=self.kernel_size,
                    quantize_like_reference=self.quantize_like_reference,
                )
            )
            groups.setdefault((H, W), []).append(b)
        for (H, W), idxs in groups.items():
            out = warp_batch_by_attention(
                jnp.asarray(np.stack([imgs255[b] for b in idxs])),
                jnp.asarray(np.stack([masks[b] for b in idxs]), jnp.float32),
                S, S, self.params,
            )
            warped[np.asarray(idxs)] = np.asarray(out)

        second_answers = None
        if self.second_pass:
            # `warped` is float [0,255] BY CONSTRUCTION (_to_float255), so
            # scale explicitly instead of letting _resize_for_backend's
            # max() heuristic guess (a near-black warped image would be
            # misread as already [0,1] — the device path divides by 255
            # unconditionally and the two flows must agree)
            warped_in = np.stack(
                [_resize_for_backend(w / np.float32(255.0),
                                     self.backend.image_size)
                 for w in warped]
            )
            # the second pass only needs TEXT — backends with the answer-only
            # fast path (extract_layer=None: no attention materialized, no
            # accumulator scanned) skip the extraction work entirely
            if hasattr(self.backend, "answer_batch"):
                second_answers = self.backend.answer_batch(
                    warped_in, list(questions),
                    max_new_tokens=self.max_new_tokens,
                )
            else:
                _maps2, second_answers = self.backend.extract(
                    warped_in, list(questions), max_new_tokens=self.max_new_tokens
                )

        return AttWarpResult(
            warped=warped,
            attention_maps=np.asarray(maps),
            mota_masks=masks,
            first_answers=list(first_answers),
            second_answers=second_answers,
        )

    def _run_device(
        self, images: Sequence[np.ndarray], questions: Sequence[str]
    ) -> AttWarpResult:
        """Device-resident two-pass flow: three downloads total (maps,
        masks, warped) regardless of batch size — every resize, the MOTA
        mask, the warp, and the pass-2 CLIP input stay on device, and the
        mask+warp pair runs as ONE program per image-shape group."""
        from attwarp_tpu.extract.extraction import (
            _to01_scale,
            resize_images_batch,
            resize_scale_device,
        )

        B = len(images)
        arrs = [np.asarray(im) for im in images]

        # pass 1: extraction on device-preprocessed pixels
        pix1 = resize_images_batch(arrs, self.backend.image_size)
        maps, first_answers = self.backend.extract(
            pix1, list(questions), max_new_tokens=self.max_new_tokens
        )
        del pix1  # free HBM before the mask+warp and answer programs
        maps = np.asarray(maps)
        if maps.ndim == 4:  # multi-layer backend: first listed layer is primary
            maps = maps[0]

        # fused mask+warp per (raw shape, scale, bucketed shape) group:
        # upload the raw batch once, resize to the bucketed [0,255] size,
        # build every MOTA mask and warp every image in one dispatch
        S = self.warp_size
        groups: dict = {}
        for b, a in enumerate(arrs):
            tgt = self._bucket_target(a.shape[:2])
            groups.setdefault((a.shape, _to01_scale(a), tgt), []).append(b)
        masks: List[Optional[np.ndarray]] = [None] * B
        order: List[int] = []
        pieces = []
        for (shape, scale01, tgt), idxs in groups.items():
            batch = jax.device_put(np.stack([arrs[b] for b in idxs]))
            img255 = resize_scale_device(batch, jnp.float32(255.0 * scale01), tgt)
            g_masks, g_warped = _mask_warp_fused(
                jnp.asarray(maps[np.asarray(idxs)], jnp.float32), img255, tgt,
                S, self.enhance_coe, self.kernel_size,
                self.quantize_like_reference, self.params,
            )
            g_masks_np = np.asarray(g_masks)  # ONE download per shape group
            for j, b in enumerate(idxs):
                masks[b] = g_masks_np[j]
            pieces.append(g_warped)
            order.extend(idxs)
            del batch, img255, g_masks, g_warped
        warped_all = (
            jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else pieces[0]
        )
        del pieces
        if order != list(range(B)):
            warped_all = warped_all[jnp.asarray(np.argsort(order))]

        second_answers = None
        if self.second_pass:
            # pass 2 consumes the device-resident warped batch directly.
            # Compute its (small) input, then download the warped result and
            # DROP every other device buffer before the answer program runs —
            # a 7B B=16 answer pass needs most of HBM beside the weights.
            pix2 = resize_scale_device(
                warped_all, jnp.float32(1.0 / 255.0),
                (self.backend.image_size, self.backend.image_size),
            )
            warped_all = np.asarray(warped_all)
            if hasattr(self.backend, "answer_batch"):
                second_answers = self.backend.answer_batch(
                    pix2, list(questions), max_new_tokens=self.max_new_tokens
                )
            else:
                _m2, second_answers = self.backend.extract(
                    pix2, list(questions), max_new_tokens=self.max_new_tokens
                )

        return AttWarpResult(
            warped=np.asarray(warped_all),
            attention_maps=maps,
            mota_masks=masks,
            first_answers=list(first_answers),
            second_answers=second_answers,
        )

    def _bucket_target(self, hw) -> tuple:
        """Bucketed (H, W) for a raw image size (host-side shape math)."""
        if self.size_bucket <= 0:
            return (int(hw[0]), int(hw[1]))
        b = self.size_bucket

        def snap(n):
            return min(((n + b - 1) // b) * b, self.max_side)

        return (snap(int(hw[0])), snap(int(hw[1])))

    def _bucket_size(self, im: np.ndarray) -> np.ndarray:
        """Round (H, W) up to the size bucket (and down to max_side) so the
        number of distinct compiled warp shapes stays bounded."""
        if self.size_bucket <= 0:
            return im
        import jax

        H, W = im.shape[:2]
        b = self.size_bucket

        def snap(n):
            return min(((n + b - 1) // b) * b, self.max_side)

        H2, W2 = snap(H), snap(W)
        if (H2, W2) == (H, W):
            return im
        out = jax.image.resize(jnp.asarray(im), (H2, W2, im.shape[2]), "linear")
        return np.asarray(out, np.float32)

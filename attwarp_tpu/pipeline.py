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

from attwarp_tpu.warp.blend import mota_mask
from attwarp_tpu.warp.transforms import Transform, WarpParams
from attwarp_tpu.warp.warp import warp_batch_by_attention


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

        assert len(images) == len(questions)
        batch_in = np.stack(
            [_resize_for_backend(im, self.backend.image_size) for im in images]
        )

        # pass 1: extraction (MLLM decode with scan-carried accumulation)
        maps, first_answers = self.backend.extract(
            batch_in, list(questions), max_new_tokens=self.max_new_tokens
        )

        # mask + warp, per-sample at native resolution (sizes may differ)
        S = self.warp_size
        masks: List[np.ndarray] = []
        warped = np.empty((len(images), S, S, 3), np.float32)
        for b, im in enumerate(images):
            im_arr = np.asarray(im, np.float32)
            if im_arr.max() <= 1.5:
                im_arr = im_arr * 255.0
            H, W = im_arr.shape[:2]
            mask = mota_mask(
                jnp.asarray(maps[b], jnp.float32), (H, W),
                enhance_coe=self.enhance_coe, kernel_size=self.kernel_size,
                quantize_like_reference=self.quantize_like_reference,
            )
            masks.append(np.asarray(mask))
            warped[b] = np.asarray(
                warp_batch_by_attention(
                    jnp.asarray(im_arr)[None],
                    jnp.asarray(mask, jnp.float32)[None],
                    S, S, self.params,
                )[0]
            )

        second_answers = None
        if self.second_pass:
            warped_in = np.stack(
                [_resize_for_backend(w, self.backend.image_size) for w in warped]
            )
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

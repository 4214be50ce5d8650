"""Cross-attention-sourced warping (the SD-warp ablation, C26).

Attention-source-agnostic math from ``Ablations/Stable_diffusion_based_warp.py``:
- ``compute_token_importance`` (:310-360): mean per-token attention mass
  over captured maps, with timestep/layer selection.
- ``aggregate_attention_map_for_tokens`` (:365-402): sum the top-k token
  channels into 2-D maps, resize to a common grid, average, min-max
  normalize.
- ``run_cross_attention_warp``: the full pipeline with an injectable
  ``capture_fn``. The diffusers-side capture (768px VAE encode, truncated
  DDIM inversion, cross-attention recording processors) lives in
  ``warp/sd_capture.py`` — ``make_sd_capture_fn`` builds the callable; it
  is duck-typed against the pipeline surface and stub-tested
  (tests/test_sd_capture.py), with only the actual diffusers/SD-weights
  load unavailable in a zero-egress environment.

Captured-map convention (matching the reference): ``dict[timestep ->
dict[layer_key -> array (B, heads, H, W, tokens)]]``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.warp.iterative import condition_attention_map, iterative_warp
from attwarp_tpu.warp.transforms import Transform


def compute_token_importance(
    captured_maps: Dict,
    inference_step_selection: Optional[Sequence] = None,
    num_layers: Optional[int] = None,
    last_timestep: bool = False,
) -> np.ndarray:
    """Per-token importance = attention mass summed over (B, heads, H, W),
    averaged over the selected timesteps/layers."""
    if last_timestep:
        t = max(captured_maps.keys())
        layer_dict = captured_maps[t]
        k = max(layer_dict.keys())
        return np.asarray(layer_dict[k], np.float64).sum(axis=(0, 1, 2, 3))

    timesteps = (
        [t for t in captured_maps if t in inference_step_selection]
        if inference_step_selection is not None
        else list(captured_maps.keys())
    )
    scores: List[np.ndarray] = []
    for t in timesteps:
        layer_dict = captured_maps[t]
        keys = sorted(layer_dict.keys())
        if num_layers is not None:
            keys = keys[-num_layers:]
        for k in keys:
            scores.append(np.asarray(layer_dict[k], np.float64).sum(axis=(0, 1, 2, 3)))
    if not scores:
        raise ValueError("No attention maps to compute token importance")
    return np.mean(scores, axis=0)


def aggregate_attention_map_for_tokens(
    captured_maps: Dict,
    token_indices: Sequence[int],
    inference_step_selection: Optional[Sequence] = None,
    num_last_layers: int = 1,
) -> np.ndarray:
    """Sum the selected token channels to 2-D maps, resize all to the max
    grid, average, min-max normalize to [0, 1]."""
    maps_2d: List[np.ndarray] = []
    steps = sorted(captured_maps.keys())
    if inference_step_selection is not None:
        steps = [s for s in steps if s in inference_step_selection]
    idx = np.asarray(list(token_indices), np.int64)
    for step in steps:
        layer_dict = captured_maps[step]
        for key in sorted(layer_dict.keys())[-num_last_layers:]:
            attn = np.asarray(layer_dict[key], np.float32)  # (B,heads,H,W,T)
            m = attn[..., idx].sum(axis=(0, 1, -1))  # (H, W)
            maps_2d.append(m.astype(np.float32))
    if not maps_2d:
        raise ValueError("No attention maps to aggregate")

    from attwarp_tpu.warp.blend import resize_cubic

    max_h = max(m.shape[0] for m in maps_2d)
    max_w = max(m.shape[1] for m in maps_2d)
    resized = [
        m
        if m.shape == (max_h, max_w)
        else np.asarray(resize_cubic(jnp.asarray(m), (max_h, max_w)))
        for m in maps_2d
    ]
    out = np.stack(resized, axis=0).mean(axis=0)
    out -= out.min()
    out /= out.max() + 1e-9
    return out


def run_cross_attention_warp(
    image: np.ndarray,                      # (H, W, 3)
    prompt: str,
    capture_fn: Callable[[np.ndarray, str], Dict],
    top_k: int = 20,
    iterations: int = 1,
    width: int = 500,
    height: int = 500,
    transform: Transform = Transform.IDENTITY,
    exp_scale: float = 1.0,
    exp_divisor: float = 1.0,
    apply_inverse: bool = False,
    num_last_layers: int = 1,
):
    """Full C26 pipeline: capture -> token importance -> top-k aggregation ->
    cubic-upsample + Gaussian conditioning -> iterative warp.

    ``capture_fn(image, prompt)`` must return the captured-map dict (for
    Stable Diffusion: DDIM truncated inversion at t in {1000..200}, forward
    denoise with cross-attention hooks — external dependency).

    Returns (list of warp iterates, conditioned attention map).
    """
    captured = capture_fn(image, prompt)
    scores = compute_token_importance(captured)
    top = list(np.argsort(scores)[-top_k:][::-1])
    att_lr = aggregate_attention_map_for_tokens(
        captured, top, num_last_layers=num_last_layers
    )
    H, W = image.shape[:2]
    att = condition_attention_map(jnp.asarray(att_lr), (H, W))
    outs = iterative_warp(
        jnp.asarray(image, jnp.float32), att, width, height,
        iterations=iterations, transform=transform, exp_scale=exp_scale,
        exp_divisor=exp_divisor, apply_inverse=apply_inverse,
    )
    return outs, np.asarray(att)

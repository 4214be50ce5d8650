"""Host-side warp orchestration and artifact IO (C3).

Parity with ``save_warped_image`` (new_method.py:405-506): load image, coerce
the attention map (ndarray / PIL / list; 3-D -> channel mean), save the
original and a JET-overlay, resize the image to the attention-map dims, warp
on device, save. The compute (resize, overlay normalization, warp) runs in
jnp; only decode/encode of image files stays on the host.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from attwarp_tpu.utils.colormap import apply_jet
from attwarp_tpu.warp.transforms import Transform, WarpParams
from attwarp_tpu.warp.warp import warp_image_by_attention

EPSILON = 1e-9


def load_image_rgb(path_or_image) -> np.ndarray:
    """Path / PIL / ndarray -> (H, W, 3) uint8 RGB."""
    if isinstance(path_or_image, str):
        with Image.open(path_or_image) as im:
            return np.asarray(im.convert("RGB"))
    if isinstance(path_or_image, Image.Image):
        return np.asarray(path_or_image.convert("RGB"))
    arr = np.asarray(path_or_image)
    if arr.dtype != np.uint8:
        arr = np.clip(np.rint(arr), 0, 255).astype(np.uint8)
    return arr


def coerce_att_map(att_map, default_hw: Tuple[int, int] = (500, 500)) -> np.ndarray:
    """ndarray / PIL / list handling with 3-D -> mean (new_method.py:432-452)."""
    if isinstance(att_map, list):
        if att_map:
            att_map = att_map[0]
        else:
            return np.ones(default_hw, dtype=np.float32) * 128
    if isinstance(att_map, Image.Image):
        att_map = np.asarray(att_map)
    att_map = np.asarray(att_map, dtype=np.float32)
    att_map = np.squeeze(att_map)
    if att_map.ndim == 3:
        att_map = att_map.mean(axis=2)
    if att_map.ndim != 2:
        raise ValueError(f"Attention map must be 2D, got shape {att_map.shape}")
    return att_map


def resize_image_to_match_attmap(image: np.ndarray, att_map: np.ndarray) -> np.ndarray:
    """Bilinear resize (half-pixel centers, cv2 INTER_LINEAR convention) to
    the attention map's dims (new_method.py:355-376)."""
    th, tw = att_map.shape[:2]
    if image.shape[:2] == (th, tw):
        return image.copy()
    out = jax.image.resize(
        jnp.asarray(image, jnp.float32), (th, tw, image.shape[2]), method="linear"
    )
    return np.clip(np.rint(np.asarray(out)), 0, 255).astype(np.uint8)


def attention_overlay(
    image: np.ndarray, att_map: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Resize to image dims FIRST, then min-max normalize (matching
    new_method.py:461-469 — normalizing by the resized map's extremes keeps
    the full JET range even when upsampling smooths the peak), then
    colormap + alpha-blend."""
    a = np.asarray(att_map, np.float64)
    if a.shape[:2] != image.shape[:2]:
        a = np.asarray(
            jax.image.resize(jnp.asarray(a, jnp.float32), image.shape[:2], "linear"),
            dtype=np.float64,
        )
    lo, hi = a.min(), a.max()
    if hi > lo + EPSILON:
        a = (a - lo) / (hi - lo)
    else:
        a = np.zeros_like(a)
    heat = apply_jet(np.clip(a * 255, 0, 255).astype(np.uint8))
    out = heat.astype(np.float64) * alpha + image.astype(np.float64) * (1 - alpha)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def save_warped_image(
    image_path,
    att_map,
    original_image_save_path: Optional[str],
    masked_overlay_save_path: Optional[str],
    output_path: str,
    vis_path: Optional[str] = None,
    width: int = 500,
    height: int = 500,
    transform: Union[str, Transform] = "identity",
    exp_scale: float = 1.0,
    exp_divisor: float = 1.0,
    apply_inverse: bool = False,
    attention_alpha: float = 0.5,
) -> bool:
    """Process and save warped image + original + overlay (C3)."""
    try:
        image = load_image_rgb(image_path)
        if original_image_save_path:
            Image.fromarray(image).save(original_image_save_path)

        att = coerce_att_map(att_map, default_hw=(height, width))

        if masked_overlay_save_path:
            Image.fromarray(attention_overlay(image, att, attention_alpha)).save(
                masked_overlay_save_path
            )

        image_for_warping = resize_image_to_match_attmap(image, att)
        params = WarpParams(
            transform=Transform.from_name(
                transform.value if isinstance(transform, Transform) else transform
            ),
            exp_scale=exp_scale,
            exp_divisor=exp_divisor,
            apply_inverse_to_marginals=apply_inverse,
        )
        warped = np.asarray(
            warp_image_by_attention(
                jnp.asarray(image_for_warping, jnp.float32),
                jnp.asarray(att, jnp.float32),
                width,
                height,
                params,
            )
        )
        warped8 = np.clip(np.rint(warped), 0, 255).astype(np.uint8)
        Image.fromarray(warped8).save(output_path)

        if vis_path:
            save_visualization_strip(
                image_for_warping, att, warped8, vis_path,
                params.transform.value, attention_alpha,
            )
        return True
    except Exception as e:
        print(f"Error during processing: {e}")
        return False


def save_visualization_strip(
    image: np.ndarray,
    att_map: np.ndarray,
    warped_image: np.ndarray,
    output_path: str,
    transform_name: str,
    attention_alpha: float = 0.5,
) -> None:
    """3-panel strip [original | attention overlay | warped] with labels and
    a grid on the warped panel (new_method.py:285-353)."""
    from PIL import ImageDraw

    overlay = attention_overlay(image, att_map, attention_alpha)
    h = max(image.shape[0], warped_image.shape[0])

    def fit(im: np.ndarray) -> np.ndarray:
        if im.shape[0] == h:
            return im
        scale = h / im.shape[0]
        w = int(im.shape[1] * scale)
        out = jax.image.resize(jnp.asarray(im, jnp.float32), (h, w, 3), "linear")
        return np.clip(np.rint(np.asarray(out)), 0, 255).astype(np.uint8)

    panels = [fit(image), fit(overlay), fit(warped_image)]
    strip = np.concatenate(panels, axis=1)
    img = Image.fromarray(strip)
    draw = ImageDraw.Draw(img)
    x = 0
    for label, panel in zip(
        ["Original", "Attention Map", f"Warped ({transform_name})"], panels
    ):
        draw.text((x + 10, 10), label, fill=(255, 255, 255))
        if x:
            draw.line([(x, 0), (x, h)], fill=(255, 255, 255), width=2)
        x += panel.shape[1]
    # grid on the warped panel
    x0 = panels[0].shape[1] + panels[1].shape[1]
    for gx in range(x0, strip.shape[1], 20):
        draw.line([(gx, 0), (gx, h)], fill=(255, 255, 255), width=1)
    for gy in range(0, h, 20):
        draw.line([(x0, gy), (strip.shape[1], gy)], fill=(255, 255, 255), width=1)
    img.save(output_path)


def next_run_dir(base_output_dir: str) -> str:
    """Auto-incrementing run_N directory (new_method.py:534-545)."""
    os.makedirs(base_output_dir, exist_ok=True)
    run_id = 0
    while True:
        d = os.path.join(base_output_dir, f"run_{run_id}")
        if not os.path.exists(d):
            os.makedirs(d)
            return d
        run_id += 1

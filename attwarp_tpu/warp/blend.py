"""Mask blending / "MOTA mask" pipeline (C9).

Reference: ``attention_extraction/llava.py:195-270`` — a 24×24 attention map
is min-normalized, z-score-enhanced through a sigmoid, box-filtered with
replicate padding, quantized to uint8 (torchvision ``ToPILImage`` truncates
``x*255``), resized to the image size with PIL LANCZOS, and overlaid with a
JET colormap. The resized grayscale mask is the attention input of the warp
in the dataset drivers (main.py:500-533).

TPU-native design: every linear stage (box filter, Lanczos resize) becomes a
precomputed constant matrix applied by matmul, so the whole mask pipeline
fuses into a handful of MXU ops under jit. ``quantize_like_reference=True``
inserts the two uint8 quantization points of the reference so downstream
artifacts match bit-for-bit at the uint8 level.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attwarp_tpu.numerics.precision import matmul_f32


def normalize_minmax(mat: jnp.ndarray, method: str = "min") -> jnp.ndarray:
    """llava.py:207-213. 'min': (x-min)/(max-min); 'max': (max-x)/(max-min).

    Deviation from the reference: a constant map divides 0/0 there (NaN
    mask); here it yields zeros so the pipeline degrades to a neutral mask.
    """
    lo = jnp.min(mat)
    hi = jnp.max(mat)
    rng = hi - lo
    num = (mat - lo) if method == "min" else (hi - mat)
    if method not in ("min", "max"):
        raise NotImplementedError(method)
    return jnp.where(rng > 0, num / jnp.where(rng > 0, rng, 1.0), 0.0)


def enhance(mat: jnp.ndarray, coe: float = 10.0) -> jnp.ndarray:
    """Z-score (unbiased std, like torch.std) -> scale -> sigmoid -> clamp.
    llava.py:215-221. Constant input (std 0) maps to the neutral sigmoid(0)
    instead of the reference's NaN."""
    mat = mat - jnp.mean(mat)
    n = mat.size
    std = jnp.sqrt(jnp.sum(mat * mat) / jnp.maximum(n - 1, 1))
    mat = jnp.where(std > 0, mat / jnp.where(std > 0, std, 1.0), 0.0) * coe
    return jnp.clip(jax.nn.sigmoid(mat), 0.0, 1.0)


def replicate_fir_matrix(n: int, kernel: np.ndarray) -> np.ndarray:
    """Any odd-length 1-D FIR kernel with replicate padding as an (n, n)
    matrix (shared by the box and Gaussian filters)."""
    k = np.asarray(kernel, np.float64)
    assert k.size % 2 == 1
    r = k.size // 2
    M = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for dj in range(-r, r + 1):
            M[i, min(max(i + dj, 0), n - 1)] += k[dj + r]
    return M


@lru_cache(maxsize=64)
def _box_matrix_np(n: int, kernel_size: int) -> np.ndarray:
    """1-D replicate-padded box filter as an (n, n) matrix."""
    return replicate_fir_matrix(
        n, np.full(kernel_size, 1.0 / kernel_size, np.float64)
    )


def revise_mask(
    patch_mask: jnp.ndarray, kernel_size: int = 3, enhance_coe: float = 10.0
) -> jnp.ndarray:
    """Min-normalize -> enhance -> replicate-padded box filter (llava.py:223-238).

    The 2-D box conv is separable, so it runs as two tiny matmuls.
    """
    m = enhance(normalize_minmax(patch_mask, "min"), coe=enhance_coe)
    h, w = m.shape[-2], m.shape[-1]
    By = jnp.asarray(_box_matrix_np(h, kernel_size), dtype=jnp.float32)
    Bx = jnp.asarray(_box_matrix_np(w, kernel_size), dtype=jnp.float32)
    return matmul_f32(matmul_f32(By, m), Bx.T)


def _lanczos(x: np.ndarray, a: float = 3.0) -> np.ndarray:
    """Lanczos-3 kernel (PIL's LANCZOS filter)."""
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / a)
    return np.where(np.abs(x) < a, out, 0.0)


@lru_cache(maxsize=128)
def _lanczos_matrix_np(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) PIL-compatible LANCZOS resampling matrix.

    Replicates PIL's window/weight rule: per output pixel, center =
    (i + 0.5) * scale; support widened by max(scale, 1); weights evaluated at
    (j - center + 0.5) / filterscale and normalized over the clipped window.
    """
    support = 3.0
    scale = in_len / out_len
    filterscale = max(scale, 1.0)
    support_scaled = support * filterscale
    M = np.zeros((out_len, in_len), dtype=np.float64)
    for i in range(out_len):
        center = (i + 0.5) * scale
        xmin = max(int(center - support_scaled + 0.5), 0)
        xmax = min(int(center + support_scaled + 0.5), in_len)
        js = np.arange(xmin, xmax)
        w = _lanczos((js - center + 0.5) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        M[i, xmin:xmax] = w
    return M


def _clip8(x: jnp.ndarray) -> jnp.ndarray:
    """Pillow's clip8: round-half-up then clamp to [0, 255] (stays float32)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def resize_lanczos(
    x: jnp.ndarray, out_hw: Tuple[int, int], uint8_mode: bool = False
) -> jnp.ndarray:
    """Separable LANCZOS resize ``(H, W) -> out_hw`` as two matmuls.

    ``uint8_mode`` reproduces Pillow's 8-bit pipeline: horizontal pass first,
    quantized to uint8 levels, then the vertical pass, quantized again —
    Pillow's intermediate image is itself uint8, so overshoot clamps between
    passes and this ordering is observable."""
    out_h, out_w = out_hw
    H, W = x.shape[-2], x.shape[-1]
    Ly = jnp.asarray(_lanczos_matrix_np(H, out_h), dtype=jnp.float32)
    Lx = jnp.asarray(_lanczos_matrix_np(W, out_w), dtype=jnp.float32)
    if uint8_mode:
        tmp = _clip8(matmul_f32(x.astype(jnp.float32), Lx.T))
        return _clip8(matmul_f32(Ly, tmp))
    return matmul_f32(matmul_f32(Ly, x.astype(jnp.float32)), Lx.T)


def _keys_cubic(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys bicubic kernel; a=-0.75 is cv2's INTER_CUBIC (jax.image.resize
    'cubic' uses a=-0.5, which differs at the percent level near edges)."""
    t = np.abs(np.asarray(t, np.float64))
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return w


@lru_cache(maxsize=64)
def _cubic_matrix_np(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) cv2-INTER_CUBIC-compatible resampling matrix:
    half-pixel centers, Keys a=-0.75, border replicate."""
    scale = in_len / out_len
    M = np.zeros((out_len, in_len), dtype=np.float64)
    for i in range(out_len):
        s = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(s))
        d = s - x0
        for j in (-1, 0, 1, 2):
            M[i, min(max(x0 + j, 0), in_len - 1)] += _keys_cubic(j - d)
    return M


def resize_cubic(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Separable bicubic resize ``(H, W) -> out_hw`` with cv2's kernel."""
    out_h, out_w = out_hw
    H, W = x.shape[-2], x.shape[-1]
    Cy = jnp.asarray(_cubic_matrix_np(H, out_h), dtype=jnp.float32)
    Cx = jnp.asarray(_cubic_matrix_np(W, out_w), dtype=jnp.float32)
    return matmul_f32(matmul_f32(Cy, x.astype(jnp.float32)), Cx.T)


def quantize_uint8_trunc(x: jnp.ndarray) -> jnp.ndarray:
    """torchvision ToPILImage float->uint8: truncate x*255 (mul(255).byte())."""
    return jnp.clip(jnp.floor(x * 255.0), 0.0, 255.0).astype(jnp.uint8)


def quantize_uint8_round(x: jnp.ndarray) -> jnp.ndarray:
    """PIL resample output clamp: round-half-to-even then clip to [0, 255]."""
    return jnp.clip(jnp.rint(x), 0.0, 255.0).astype(jnp.uint8)


@partial(
    jax.jit,
    static_argnames=("out_hw", "kernel_size", "quantize_like_reference"),
)
def mota_mask(
    att: jnp.ndarray,
    out_hw: Tuple[int, int],
    enhance_coe: float = 10.0,
    kernel_size: int = 3,
    quantize_like_reference: bool = True,
) -> jnp.ndarray:
    """Full mask pipeline: ``att (h, w)`` float -> image-size mask.

    With ``quantize_like_reference`` the output is uint8 in [0, 255] matching
    the reference artifact contract (the ``mota_mask.npy`` the drivers save
    and feed into the warp); otherwise a float mask in [0, 255] with no
    intermediate quantization (higher fidelity, same scale).
    """
    m = revise_mask(att, kernel_size=kernel_size, enhance_coe=enhance_coe)
    if quantize_like_reference:
        m8 = quantize_uint8_trunc(m).astype(jnp.float32)
        return resize_lanczos(m8, out_hw, uint8_mode=True).astype(jnp.uint8)
    return jnp.clip(resize_lanczos(m * 255.0, out_hw), 0.0, 255.0)


def blend_mask(
    image_rgb: np.ndarray,
    att: jnp.ndarray,
    enhance_coe: float = 10.0,
    kernel_size: int = 3,
    grayscale: float = 0.0,
    quantize_like_reference: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side convenience mirroring ``blend_mask`` (llava.py:240-270).

    image_rgb: ``(H, W, 3)`` uint8. Returns ``(overlay_rgb uint8, mask)``
    where ``mask`` is the image-size grayscale MOTA mask (uint8 when
    ``quantize_like_reference``). The JET-colormap overlay uses
    ``alpha = grayscale if 0 < grayscale <= 1 else 0.5`` (llava.py:266)."""
    from attwarp_tpu.utils.colormap import apply_jet

    H, W = image_rgb.shape[0], image_rgb.shape[1]
    mask = np.asarray(
        mota_mask(
            jnp.asarray(att, dtype=jnp.float32),
            (H, W),
            enhance_coe=enhance_coe,
            kernel_size=kernel_size,
            quantize_like_reference=quantize_like_reference,
        )
    )
    # cv2.normalize(..., 0, 255, NORM_MINMAX) on the mask before colormapping.
    m = mask.astype(np.float64)
    lo, hi = m.min(), m.max()
    if hi > lo:
        m = (m - lo) * (255.0 / (hi - lo))
    else:
        m = np.zeros_like(m)
    heat = apply_jet(np.clip(np.rint(m), 0, 255).astype(np.uint8))
    alpha = grayscale if isinstance(grayscale, (int, float)) and 0 < grayscale <= 1 else 0.5
    overlay = np.clip(
        np.rint(image_rgb.astype(np.float64) * (1 - alpha) + heat.astype(np.float64) * alpha),
        0,
        255,
    ).astype(np.uint8)
    return overlay, mask


def merge_gray(mask: np.ndarray, image_rgb: np.ndarray, gray_scale: float = 200.0) -> np.ndarray:
    """Gray-blend helper (llava.py:198-205): image*m + (1-m)*gray."""
    m = mask.astype(np.float32) / 255.0
    gray = np.full_like(image_rgb, gray_scale, dtype=np.float32)
    out = image_rgb.astype(np.float32) * m[..., None] + (1 - m[..., None]) * gray
    return out.astype(np.uint8)

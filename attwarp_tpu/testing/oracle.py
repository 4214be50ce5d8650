"""NumPy golden oracle: an independent re-derivation of the reference math.

These functions re-implement, in plain NumPy (float64, cv2 for resampling
when available), the numerical behavior of:
- ``warp_image_by_attention``      (new_method.py:198-283)
- ``warp_from_cdf_torch``          (checkpoint_utils.py:133-204)
- ``upsample_pdf_right_inverse``   (checkpoint_utils.py:64-131)
- torch ``adaptive_avg_pool1d``    window rule
- the mask pipeline                (llava.py:207-238 + PIL LANCZOS)

They exist ONLY for golden-value testing of the TPU implementations; nothing
in the production path imports this module.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

EPSILON = 1e-9
BASE_ATTENTION = 1e-9


def np_transform(name: str, exp_scale: float = 1.0, exp_divisor: float = 1.0) -> Callable:
    return {
        "identity": lambda x: x,
        "square": lambda x: x**2,
        "sqrt": lambda x: np.sqrt(np.maximum(x, 0)),
        "exp": lambda x: np.exp(exp_scale * x) / exp_divisor,
        "log": lambda x: np.log(x + 1e-5),
    }[name]


def np_inverse(name: str, exp_scale: float = 1.0, exp_divisor: float = 1.0) -> Callable:
    return {
        "identity": lambda x: x,
        "square": lambda x: np.sqrt(np.maximum(x, 0)),
        "sqrt": lambda x: x**2,
        "exp": lambda x: np.log(np.maximum(x * exp_divisor, 1e-9)) / exp_scale,
        "log": lambda x: np.exp(x) - 1e-5,
    }[name]


def _remap(image: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    """cv2.remap(INTER_LINEAR, BORDER_REPLICATE) — via cv2 when available,
    else exact float bilinear with clamped indices (verified equivalent for
    OpenCV >= 4 float paths)."""
    try:
        import cv2

        return cv2.remap(
            image,
            map_x.astype(np.float32),
            map_y.astype(np.float32),
            interpolation=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_REPLICATE,
        )
    except Exception:
        H, W = image.shape[:2]
        x0 = np.floor(map_x).astype(np.int64)
        y0 = np.floor(map_y).astype(np.int64)
        fx = (map_x - x0)[..., None] if image.ndim == 3 else map_x - x0
        fy = (map_y - y0)[..., None] if image.ndim == 3 else map_y - y0
        cx0 = np.clip(x0, 0, W - 1)
        cx1 = np.clip(x0 + 1, 0, W - 1)
        cy0 = np.clip(y0, 0, H - 1)
        cy1 = np.clip(y0 + 1, 0, H - 1)
        img = image.astype(np.float32)
        out = (
            img[cy0, cx0] * (1 - fx) * (1 - fy)
            + img[cy0, cx1] * fx * (1 - fy)
            + img[cy1, cx0] * (1 - fx) * fy
            + img[cy1, cx1] * fx * fy
        )
        if image.dtype == np.uint8:
            out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
        return out


def warp_image_by_attention_oracle(
    image: np.ndarray,
    att_map: np.ndarray,
    new_width: int,
    new_height: int,
    transform: str = "identity",
    exp_scale: float = 1.0,
    exp_divisor: float = 1.0,
    apply_inverse: bool = False,
) -> np.ndarray:
    """C1 oracle: float64 profile math + cv2 remap."""
    h, w = image.shape[:2]
    a = np.maximum(att_map.astype(np.float64), 0)
    a = np_transform(transform, exp_scale, exp_divisor)(a)
    a_biased = a + BASE_ATTENTION

    profile_x = a_biased.sum(axis=0)
    profile_y = a_biased.sum(axis=1)
    if apply_inverse:
        inv = np_inverse(transform, exp_scale, exp_divisor)
        profile_x = inv(profile_x - BASE_ATTENTION * h) + BASE_ATTENTION * h
        profile_y = inv(profile_y - BASE_ATTENTION * w) + BASE_ATTENTION * w

    total_x = profile_x.sum()
    total_y = profile_y.sum()
    if total_x < EPSILON or total_y < EPSILON:
        profile_x = np.ones(w, dtype=np.float64)
        profile_y = np.ones(h, dtype=np.float64)
        total_x = max(w * (a_biased.mean() * h), EPSILON)
        total_y = max(h * (a_biased.mean() * w), EPSILON)

    x_new = np.concatenate(([0], np.cumsum(profile_x) / total_x)) * new_width
    x_orig = np.concatenate(([0], np.arange(w) + 1)).astype(np.float64)
    y_new = np.concatenate(([0], np.cumsum(profile_y) / total_y)) * new_height
    y_orig = np.concatenate(([0], np.arange(h) + 1)).astype(np.float64)
    x_new[-1] = new_width
    y_new[-1] = new_height

    map_x = np.interp(np.arange(new_width), x_new, x_orig)
    map_y = np.interp(np.arange(new_height), y_new, y_orig)
    fx, fy = np.meshgrid(map_x, map_y)
    return _remap(image, fx.astype(np.float32), fy.astype(np.float32))


def warp_from_cdf_oracle(
    images: np.ndarray,
    Fx: np.ndarray,
    Fy: np.ndarray,
    out_size: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """C4 oracle: per-sample loop, tie-jitter, cv2 remap.
    images: (B, H, W, C)."""
    B, H, W = images.shape[:3]
    H_out, W_out = (H, W) if out_size is None else out_size
    outs = []
    for b in range(B):
        fx = np.asarray(Fx[b], dtype=np.float32).reshape(-1)
        fy = np.asarray(Fy[b], dtype=np.float32).reshape(-1)
        x_new = np.concatenate(([0.0], fx)) * float(W_out)
        x_orig = np.concatenate(([0.0], np.arange(W, dtype=np.float32) + 1.0))
        y_new = np.concatenate(([0.0], fy)) * float(H_out)
        y_orig = np.concatenate(([0.0], np.arange(H, dtype=np.float32) + 1.0))
        x_new[-1] = W_out
        y_new[-1] = H_out
        if np.any(np.diff(x_new) <= 0):
            x_new = x_new + (1e-4 / max(W_out, 1)) * np.arange(x_new.size, dtype=np.float32)
        if np.any(np.diff(y_new) <= 0):
            y_new = y_new + (1e-4 / max(H_out, 1)) * np.arange(y_new.size, dtype=np.float32)
        map_x = np.interp(np.arange(W_out, dtype=np.float32), x_new, x_orig)
        map_y = np.interp(np.arange(H_out, dtype=np.float32), y_new, y_orig)
        gx, gy = np.meshgrid(map_x, map_y)
        outs.append(_remap(images[b], gx.astype(np.float32), gy.astype(np.float32)))
    return np.stack(outs, axis=0)


def adaptive_avg_pool1d_oracle(x: np.ndarray, out_len: int) -> np.ndarray:
    """torch.nn.functional.adaptive_avg_pool1d window rule, (..., L) input."""
    in_len = x.shape[-1]
    out = np.zeros(x.shape[:-1] + (out_len,), dtype=np.float64)
    for i in range(out_len):
        s = (i * in_len) // out_len
        e = -(-((i + 1) * in_len) // out_len)
        out[..., i] = x[..., s:e].mean(axis=-1)
    return out


def upsample_pdf_right_inverse_oracle(y: np.ndarray, target_len: int, eps: float = 1e-8) -> np.ndarray:
    """Minimum-norm right inverse of adaptive average pooling, float64."""
    yN = np.atleast_2d(np.asarray(y, dtype=np.float64))
    L_out = yN.shape[-1]
    L_in = int(target_len)
    i = np.arange(L_out)
    starts = (i * L_in) // L_out
    ends = -(-((i + 1) * L_in) // L_out)
    A = np.zeros((L_out, L_in), dtype=np.float64)
    for k in range(L_out):
        s, e = int(starts[k]), int(ends[k])
        A[k, s:e] = 1.0 / max(e - s, 1)
    AAT = A @ A.T + eps * np.eye(L_out)
    x_hat = (A.T @ np.linalg.solve(AAT, yN.T)).T
    return x_hat.reshape(np.asarray(y).shape[:-1] + (L_in,))


def mota_mask_oracle(
    att: np.ndarray, out_hw: Tuple[int, int], enhance_coe: float = 10.0, kernel_size: int = 3
) -> np.ndarray:
    """Mask pipeline via torch + PIL (exactly the reference ops). Requires
    torch and PIL; used only in tests."""
    import torch
    import torch.nn.functional as TF
    from PIL import Image

    m = torch.from_numpy(np.asarray(att, dtype=np.float32))
    m = (m - m.min()) / (m.max() - m.min())
    m = m - m.mean()
    m = m / m.std()
    m = torch.sigmoid(m * enhance_coe).clamp(0, 1)
    pad = kernel_size // 2
    k = torch.ones(1, 1, kernel_size, kernel_size) / kernel_size**2
    m = TF.conv2d(TF.pad(m[None, None], (pad,) * 4, mode="replicate"), k)[0, 0]
    pil = Image.fromarray((m.numpy() * 255).astype(np.uint8), mode="L")
    pil = pil.resize((out_hw[1], out_hw[0]), Image.LANCZOS)
    return np.array(pil)

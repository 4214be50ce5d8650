"""Native host-side image ops (C++ via ctypes).

Compiled on first use with g++ (cached next to the source); every entry
point has a NumPy fallback so the framework works without a toolchain. The
data pipeline uses these for host-side resizes — the role OpenCV's compiled
C++ plays in the reference (SURVEY §0: "the only native work is delegated to
cv2.remap/cv2.resize").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "attwarp_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_attwarp_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"[attwarp_native] build failed ({e}); using NumPy fallback.")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.attwarp_native_abi_version.restype = ctypes.c_int
            assert lib.attwarp_native_abi_version() == 1
            _lib = lib
        except Exception as e:
            print(f"[attwarp_native] load failed ({e}); using NumPy fallback.")
        return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(H, W[, C]) float32 -> (oh, ow[, C]); half-pixel-center bilinear."""
    squeeze = src.ndim == 2
    s = np.ascontiguousarray(src[..., None] if squeeze else src, np.float32)
    h, w, c = s.shape
    lib = _load()
    if lib is None:
        out = _np_resize_bilinear(s, oh, ow)
    else:
        out = np.empty((oh, ow, c), np.float32)
        lib.resize_bilinear_f32(_fp(s), h, w, c, _fp(out), oh, ow)
    return out[..., 0] if squeeze else out


def resize_nearest(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    squeeze = src.ndim == 2
    s = np.ascontiguousarray(src[..., None] if squeeze else src, np.float32)
    h, w, c = s.shape
    lib = _load()
    if lib is None:
        yi = np.clip((np.arange(oh) * (h / oh)).astype(int), 0, h - 1)
        xi = np.clip((np.arange(ow) * (w / ow)).astype(int), 0, w - 1)
        out = s[yi][:, xi]
    else:
        out = np.empty((oh, ow, c), np.float32)
        lib.resize_nearest_f32(_fp(s), h, w, c, _fp(out), oh, ow)
    return out[..., 0] if squeeze else out


def remap_separable(src: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    """Separable bilinear warp, border replicate (host-side)."""
    squeeze = src.ndim == 2
    s = np.ascontiguousarray(src[..., None] if squeeze else src, np.float32)
    h, w, c = s.shape
    mx = np.ascontiguousarray(map_x, np.float32)
    my = np.ascontiguousarray(map_y, np.float32)
    ow, oh = mx.shape[0], my.shape[0]
    lib = _load()
    if lib is None:
        out = _np_remap_separable(s, mx, my)
    else:
        out = np.empty((oh, ow, c), np.float32)
        lib.remap_separable_f32(_fp(s), h, w, c, _fp(mx), ow, _fp(my), oh, _fp(out))
    return out[..., 0] if squeeze else out


def box_filter(src: np.ndarray, k: int) -> np.ndarray:
    s = np.ascontiguousarray(src, np.float32)
    h, w = s.shape
    lib = _load()
    if lib is None:
        from attwarp_tpu.warp.blend import _box_matrix_np

        By = _box_matrix_np(h, k)
        Bx = _box_matrix_np(w, k)
        return (By @ s.astype(np.float64) @ Bx.T).astype(np.float32)
    out = np.empty((h, w), np.float32)
    lib.box_filter_f32(_fp(s), h, w, k, _fp(out))
    return out


# ── NumPy fallbacks ────────────────────────────────────────────────────


def _np_resize_bilinear(s: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w, _ = s.shape
    y = (np.arange(oh) + 0.5) * (h / oh) - 0.5
    x = (np.arange(ow) + 0.5) * (w / ow) - 0.5
    return _np_remap_separable(s, x.astype(np.float32), y.astype(np.float32))


def _np_remap_separable(s: np.ndarray, mx: np.ndarray, my: np.ndarray) -> np.ndarray:
    h, w, _ = s.shape
    x0 = np.floor(mx)
    fx = (mx - x0)[None, :, None]
    x0i = np.clip(x0.astype(int), 0, w - 1)
    x1i = np.clip(x0.astype(int) + 1, 0, w - 1)
    t = s[:, x0i] * (1 - fx) + s[:, x1i] * fx
    y0 = np.floor(my)
    fy = (my - y0)[:, None, None]
    y0i = np.clip(y0.astype(int), 0, h - 1)
    y1i = np.clip(y0.astype(int) + 1, 0, h - 1)
    return (t[y0i] * (1 - fy) + t[y1i] * fy).astype(np.float32)

"""JET colormap compatible with ``cv2.applyColorMap(..., COLORMAP_JET)``.

Used for attention-overlay visualizations (reference llava.py:258,
new_method.py:300,471). Uses OpenCV's own LUT when cv2 is importable (exact
parity), otherwise a piecewise-linear JET formula.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1)
def jet_lut_rgb() -> np.ndarray:
    """(256, 3) uint8 RGB lookup table."""
    try:
        import cv2

        gray = np.arange(256, dtype=np.uint8).reshape(256, 1)
        bgr = cv2.applyColorMap(gray, cv2.COLORMAP_JET).reshape(256, 3)
        return bgr[:, ::-1].copy()  # BGR -> RGB
    except Exception:
        x = np.linspace(0.0, 1.0, 256)

        def ramp(v):
            return np.clip(1.5 - np.abs(v), 0.0, 1.0)

        r = ramp(4.0 * (x - 0.75))
        g = ramp(4.0 * (x - 0.50))
        b = ramp(4.0 * (x - 0.25))
        return np.clip(np.rint(np.stack([r, g, b], axis=1) * 255), 0, 255).astype(
            np.uint8
        )


def apply_jet(gray: np.ndarray) -> np.ndarray:
    """uint8 grayscale (H, W) -> RGB heatmap (H, W, 3)."""
    return jet_lut_rgb()[gray]

"""Low-level TPU ops: the warp resample kernels and (future) Pallas
implementations. Re-exports the op-level surface of attwarp_tpu.warp."""

from attwarp_tpu.warp.resample import (
    interp_matrix,
    remap_bilinear_2d,
    remap_bilinear_separable,
    remap_bilinear_separable_mm,
    saturate_uint8,
)
from attwarp_tpu.warp.grid import piecewise_linear_inverse

__all__ = [
    "interp_matrix",
    "remap_bilinear_2d",
    "remap_bilinear_separable",
    "remap_bilinear_separable_mm",
    "saturate_uint8",
    "piecewise_linear_inverse",
]

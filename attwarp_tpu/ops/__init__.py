"""Low-level TPU ops: the XLA resample kernels, the vectorized inverse-grid
op, and the fused Pallas warp kernel."""

from attwarp_tpu.warp.resample import (
    interp_matrix,
    remap_bilinear_2d,
    remap_bilinear_separable,
    remap_bilinear_separable_mm,
    saturate_uint8,
)
from attwarp_tpu.warp.grid import piecewise_linear_inverse
from attwarp_tpu.ops.pallas_warp import (
    warp_batch_by_attention_pallas,
    warp_batch_pallas_cf,
)

__all__ = [
    "interp_matrix",
    "remap_bilinear_2d",
    "remap_bilinear_separable",
    "remap_bilinear_separable_mm",
    "saturate_uint8",
    "piecewise_linear_inverse",
    "warp_batch_by_attention_pallas",
    "warp_batch_pallas_cf",
]

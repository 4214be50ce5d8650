"""The attention-guided warp engine (TPU-native core of the framework)."""

from attwarp_tpu.warp.transforms import (
    Transform,
    WarpParams,
    apply_inverse_transform,
    apply_transform,
)
from attwarp_tpu.warp.grid import (
    BASE_ATTENTION,
    EPSILON,
    attention_profiles,
    inverse_axis_map,
    inverse_axis_map_from_cdf,
)
from attwarp_tpu.warp.resample import (
    remap_bilinear_2d,
    remap_bilinear_separable,
)
from attwarp_tpu.warp.warp import (
    warp_batch_by_attention,
    warp_from_cdf,
    warp_image_by_attention,
)
from attwarp_tpu.warp.blend import (
    blend_mask,
    enhance,
    mota_mask,
    normalize_minmax,
    revise_mask,
)

__all__ = [
    "Transform",
    "WarpParams",
    "apply_transform",
    "apply_inverse_transform",
    "BASE_ATTENTION",
    "EPSILON",
    "attention_profiles",
    "inverse_axis_map",
    "inverse_axis_map_from_cdf",
    "remap_bilinear_2d",
    "remap_bilinear_separable",
    "warp_image_by_attention",
    "warp_batch_by_attention",
    "warp_from_cdf",
    "blend_mask",
    "mota_mask",
    "enhance",
    "revise_mask",
    "normalize_minmax",
]

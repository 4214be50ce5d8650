"""Core PDF/CDF numerics shared by the warp engine and MarginalNet training."""

from attwarp_tpu.numerics.cdf import (
    cdf_from_density,
    gt_marginals,
    make_strictly_increasing,
    normalize_cdf_1d,
    resample_cdf,
)
from attwarp_tpu.numerics.pooling import (
    adaptive_avg_pool1d,
    adaptive_avg_pool2d,
    adaptive_pool_matrix,
    right_inverse_matrix,
    upsample_pdf_right_inverse,
)
from attwarp_tpu.numerics.safe import (
    entropy,
    mix_with_uniform,
    normalize_pdf,
    safe_softmax,
)
from attwarp_tpu.numerics import losses

__all__ = [
    "cdf_from_density",
    "gt_marginals",
    "make_strictly_increasing",
    "normalize_cdf_1d",
    "resample_cdf",
    "adaptive_avg_pool1d",
    "adaptive_avg_pool2d",
    "adaptive_pool_matrix",
    "right_inverse_matrix",
    "upsample_pdf_right_inverse",
    "safe_softmax",
    "mix_with_uniform",
    "entropy",
    "normalize_pdf",
    "losses",
]

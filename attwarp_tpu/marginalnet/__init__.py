"""MarginalNet: predicts the axis-marginal attention PDFs directly."""

from attwarp_tpu.marginalnet.model import MarginalNet
from attwarp_tpu.marginalnet.inference import predict_and_warp

__all__ = ["MarginalNet", "predict_and_warp"]

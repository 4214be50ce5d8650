"""MarginalNet: predicts the axis-marginal attention PDFs directly."""

from attwarp_tpu.marginalnet.model import MarginalNet

__all__ = ["MarginalNet"]

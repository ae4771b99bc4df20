"""Training harness: criterions, the fused pjit train loop, checkpoints."""

from pfn_tpu.train.losses import (
    Criterion,
    bar_criterion,
    full_support_bar_criterion,
    gaussian_nll_criterion,
    mse_criterion,
    ce_criterion,
    bce_criterion,
)
from pfn_tpu.train.loop import TrainConfig, TrainResult, train

__all__ = [
    "Criterion",
    "bar_criterion",
    "full_support_bar_criterion",
    "gaussian_nll_criterion",
    "mse_criterion",
    "ce_criterion",
    "bce_criterion",
    "TrainConfig",
    "TrainResult",
    "train",
]

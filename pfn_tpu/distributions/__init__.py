"""Distributional output heads (Riemann/bar distributions)."""

from pfn_tpu.distributions.bar import (
    BarDistribution,
    FullSupportBarDistribution,
    get_bucket_limits,
)

__all__ = ["BarDistribution", "FullSupportBarDistribution", "get_bucket_limits"]

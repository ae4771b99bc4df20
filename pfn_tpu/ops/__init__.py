"""Hot compute ops: PFN-masked attention and on-device GP sampling."""

from pfn_tpu.ops.attention import pfn_attention, pfn_attention_reference
from pfn_tpu.ops.gp_sample import (
    rbf_kernel,
    matern52_kernel,
    gp_sample_paths,
    gp_posterior,
)

__all__ = [
    "pfn_attention",
    "pfn_attention_reference",
    "rbf_kernel",
    "matern52_kernel",
    "gp_sample_paths",
    "gp_posterior",
]

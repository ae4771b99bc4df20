"""Model layer: PFN transformer, input encoders, positional encodings, heads."""

from pfn_tpu.models.transformer import PFNTransformer, TransformerConfig
from pfn_tpu.models import encoders, positional, decoders

__all__ = [
    "PFNTransformer",
    "TransformerConfig",
    "encoders",
    "positional",
    "decoders",
]

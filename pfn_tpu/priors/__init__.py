"""Prior-data layer: pure, vmappable, on-device synthetic-dataset samplers.

Contract (the TPU-native replacement for the reference's ``PriorDataLoader``
protocol, reference priors/prior.py:4-12): a Prior is an object with static
attributes ``num_features`` / ``num_outputs`` and a pure method

    sample(key, batch_size, seq_len) -> (x, y, target_y)

with ``x: (B, T, F)``, ``y: (B, T)``, ``target_y: (B, T)`` — all jnp arrays
produced entirely on device from the PRNG key. Because sampling is pure and
jittable it is fused *into* the train step (no host dataloader boundary,
unlike reference train.py:66-71).
"""

from pfn_tpu.priors.base import Prior, make_dataloader
from pfn_tpu.priors import (
    gp,
    ridge,
    gp_mix,
    mlp,
    module,
    binarize,
    stroke,
    omniglot,
    mixture,
)

__all__ = [
    "Prior",
    "make_dataloader",
    "gp",
    "ridge",
    "gp_mix",
    "mlp",
    "module",
    "binarize",
    "stroke",
    "omniglot",
    "mixture",
]

"""Decoder heads mapping transformer outputs (B, T, D) -> logits (B, T, n_out).

Parity: the default head is Linear→GELU→Linear inline at reference
transformer.py:23; optional replacements are ScaledDecoder (per-token softmax
mixture over 10 fixed temperatures, decoders.py:6-20) and FixedScaledDecoder
(global learned temperature, decoders.py:22-29).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# Host-side constant: creating a device array at import time would commit
# the default backend before callers can select a platform (and hang the
# whole library import when the TPU tunnel is down).
_TEMPERATURES = (1.0, 1.4, 1.7, 2.0, 5.0, 10.0, 20.0, 40.0, 80.0, 160.0)


class MLPDecoder(nn.Module):
    """Default Linear→GELU→Linear head (transformer.py:23).

    ``approximate=False`` selects the exact erf GELU (torch ``nn.GELU()``
    default — used for checkpoint-parity with reference-trained models)."""

    nhid: int
    n_out: int
    approximate: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.nhid, name="fc1")(x)
        h = nn.gelu(h, approximate=self.approximate)
        return nn.Dense(self.n_out, name="fc2")(h)


class ScaledDecoder(nn.Module):
    """Logits divided by a per-token softmax mixture of 10 fixed temperatures
    (decoders.py:6-20)."""

    nhid: int
    n_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.nhid, name="linear")(x)
        h = nn.gelu(h)
        temps = nn.softmax(nn.Dense(10, name="linear2")(h)) @ jnp.asarray(
            _TEMPERATURES
        )
        return nn.Dense(self.n_out, name="linear1")(h) / temps[..., None]


class FixedScaledDecoder(nn.Module):
    """Logits divided by one global learned temperature (decoders.py:22-29)."""

    nhid: int
    n_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.nhid, name="fc1")(x)
        h = nn.gelu(h)
        out = nn.Dense(self.n_out, name="fc2")(h)
        # The reference parameterizes T as sum of a 10000-vector initialized
        # to 1/10000 (== 1.0 total); a single scalar is equivalent.
        temp = self.param("T", nn.initializers.ones, ())
        return out / temp

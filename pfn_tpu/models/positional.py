"""Positional encodings.

Protocol (reference positional_encodings.py:7-9, adapted to batch-first):
a flax module mapping (B, T, D) -> (B, T, D). ``NoPositionalEncoding`` is the
PFN-correct default — the PFN attention setup is permutation-equivariant over
train points, so positions carry no information (used by reference
train.py:42 as the default).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class NoPositionalEncoding(nn.Module):
    """Identity (positional_encodings.py:12-18)."""

    max_len: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x


class SinusoidalPositionalEncoding(nn.Module):
    """Classic sin/cos table added to the input (positional_encodings.py:21-34)."""

    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_model = x.shape[-1]
        position = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(
            jnp.arange(0, d_model, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / d_model)
        )
        pe = jnp.zeros((self.max_len, d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        return x + pe[None, : x.shape[1], :]


class LearnedPositionalEncoding(nn.Module):
    """Learned position table, init N(0, d_model^-0.5)
    (positional_encodings.py:37-49)."""

    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_model = x.shape[-1]
        table = self.param(
            "pos_embedding",
            nn.initializers.normal(d_model**-0.5),
            (self.max_len, d_model),
        )
        return x + table[None, : x.shape[1], :]


class PairedScrambledPositionalEncodings(nn.Module):
    """Learned embeddings whose *pairs* are randomly permuted each forward —
    used for permutation-invariance experiments (positional_encodings.py:52-62).
    Requires an even ``max_len``; permutation is drawn from the 'scramble' RNG
    collection when not deterministic.
    """

    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        assert self.max_len % 2 == 0, "Please specify an even max_len."
        d_model = x.shape[-1]
        table = self.param(
            "pos_embedding",
            nn.initializers.normal(d_model**-0.5),
            (self.max_len, d_model),
        )
        if not deterministic:
            rng = self.make_rng("scramble")
            paired = table.reshape(self.max_len // 2, 2, d_model)
            perm = jax.random.permutation(rng, self.max_len // 2)
            table = paired[perm].reshape(self.max_len, d_model)
        return x + table[None, : x.shape[1], :]

"""Input encoders: map raw features (B, T, F) to embeddings (B, T, D).

Parity: reference encoders.py — Linear (:8), normalized-uniform wrapper
(:10-18), per-feature canonical embedding CanEmb (:22-33), embedding encoder
(:35-36). The reference file also *references* missing symbols (Normalize,
EmbeddingEncoder, encoders.MLP used by train.py:247-250); per SURVEY.md §7
these are treated as API to restore, so Normalize / MLP are provided here.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


class LinearEncoder(nn.Module):
    """nn.Linear parity (encoders.py:8)."""

    emsize: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.emsize, name="linear")(x)


class Normalize(nn.Module):
    """Fixed affine (x - mean) / std; the missing ``Normalize`` referenced at
    encoders.py:18."""

    mean: float
    std: float

    @nn.compact
    def __call__(self, x):
        return (x - self.mean) / self.std


class NormalizedUniformEncoder(nn.Module):
    """Wrap an encoder fed U(0,1) inputs: normalize to zero mean / unit std
    first (encoders.py:10-18: Normalize(.5, sqrt(1/12)))."""

    emsize: int
    inner: Callable = LinearEncoder

    @nn.compact
    def __call__(self, x):
        x = (x - 0.5) / math.sqrt(1.0 / 12.0)
        return self.inner(self.emsize, name="inner")(x)


class MLPEncoder(nn.Module):
    """Two-layer GELU MLP encoder — the ``encoders.MLP`` registry entry
    train.py:247-248 expects but the reference never shipped."""

    emsize: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden or self.emsize, name="fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(self.emsize, name="fc2")(h)


class CanonicalEmbedding(nn.Module):
    """Per-feature categorical embedding splitting emsize across features.

    Parity: CanEmb (encoders.py:22-33): each of the F integer features gets an
    (num_classes, emsize // F) table; outputs are concatenated.
    """

    num_features: int
    num_classes: int
    emsize: int

    @nn.compact
    def __call__(self, x):
        assert self.emsize % self.num_features == 0
        per = self.emsize // self.num_features
        table = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (self.num_classes, self.num_features, per),
        )
        idx = x.astype(jnp.int32)  # (B, T, F)
        gathered = table[idx, jnp.arange(self.num_features)]  # (B, T, F, per)
        return gathered.reshape(*x.shape[:-1], self.emsize)


class EmbeddingEncoder(nn.Module):
    """Quantile-free binned embedding for continuous features — the missing
    ``EmbeddingEncoder`` referenced at encoders.py:36: values in [0, 1] are
    binned into ``num_embs`` bins per feature, each bin has an embedding of
    size emsize // F, concatenated."""

    num_features: int
    emsize: int
    num_embs: int = 100

    @nn.compact
    def __call__(self, x):
        bins = jnp.clip((x * self.num_embs).astype(jnp.int32), 0, self.num_embs - 1)
        return CanonicalEmbedding(
            self.num_features, self.num_embs, self.emsize, name="emb"
        )(bins)

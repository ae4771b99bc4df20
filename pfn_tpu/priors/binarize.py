"""Binarized-regression wrapper: regression prior -> Bernoulli classification.

Parity: reference priors/binarized_regression.py:4-21 — wrap any regression
prior so that y becomes Bernoulli(sigmoid(y)); prebuilt binarized GP and
GP-mix priors mirror ``Binarized_fast_gp{,_mix}_dataloader``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pfn_tpu.priors.base import Prior
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.priors.gp_mix import GPMixPrior


@dataclasses.dataclass(frozen=True)
class BinarizedPrior:
    """y ~ Bernoulli(sigmoid(y_regression)); targets are {0., 1.}."""

    base: Prior
    num_outputs: int = 2

    @property
    def num_features(self) -> int:
        return self.base.num_features

    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        k_base, k_bern = jax.random.split(key)
        x, y, _ = self.base.sample(k_base, batch_size, seq_len)
        labels = jax.random.bernoulli(k_bern, jax.nn.sigmoid(y)).astype(jnp.float32)
        return x, labels, labels


def binarized_gp_prior(**kwargs) -> BinarizedPrior:
    """Parity: Binarized_fast_gp_dataloader (binarized_regression.py:16-18)."""
    return BinarizedPrior(base=GPPrior(**kwargs))


def binarized_gp_mix_prior(**kwargs) -> BinarizedPrior:
    """Parity: Binarized_fast_gp_mix_dataloader (binarized_regression.py:19-21)."""
    return BinarizedPrior(base=GPMixPrior(**kwargs))

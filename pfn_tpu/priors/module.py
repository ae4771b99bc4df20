"""Bring-your-own-prior: wrap any pure sampler callable into a Prior.

Parity: reference priors/pyro.py:10-32 — the public "custom prior" API where
a user supplies a model that generates one dataset, and groups of
``batch_size_per_gp_sample`` datasets share one sampled model. The torch/pyro
``model(seq_len) -> (x, y)`` contract becomes a pure JAX contract:

    sample_fn(model_key, data_key, seq_len) -> (x: (T, F), y: (T,))

``model_key`` plays the role of "which model was sampled" (shared within a
group); ``data_key`` is fresh per dataset. x is z-scored per dataset like the
reference (priors/pyro.py:20-32 normalizes x only).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from pfn_tpu.priors.transforms import normalize_data


@dataclasses.dataclass(frozen=True)
class ModulePrior:
    sample_fn: Callable  # (model_key, data_key, seq_len) -> (x (T,F), y (T,))
    num_features: int
    num_outputs: int = 1
    batch_size_per_model: int | None = None
    normalize_x: bool = True

    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        from pfn_tpu.priors.base import default_group_size

        g = self.batch_size_per_model or default_group_size(batch_size, 16)
        assert batch_size % g == 0
        num_models = batch_size // g
        k_models, k_data = jax.random.split(key)
        model_keys = jnp.repeat(
            jax.random.split(k_models, num_models), g, axis=0
        )  # (B, 2) — one model key shared within each group
        data_keys = jax.random.split(k_data, batch_size)

        def one(mk, dk):
            x, y = self.sample_fn(mk, dk, seq_len)
            return x.astype(jnp.float32), y.astype(jnp.float32)

        x, y = jax.vmap(one)(model_keys, data_keys)
        if self.normalize_x:
            x = normalize_data(x, axis=1)
        return x, y, y

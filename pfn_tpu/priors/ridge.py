"""Bayesian linear (ridge) prior — the closed-form correctness oracle prior.

Parity: reference priors/ridge.py:10-16 — weights w ~ N(0, 0.1) (std), inputs
x ~ U(0,1), y = w.x + N(0, noisy_std). ``target_y`` is the *noise-free* y
(the reference's evaluate scores MSE against it, priors/ridge.py:31).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RidgePrior:
    num_features: int = 1
    num_outputs: int = 1
    noisy_std: float = 0.1
    weight_std: float = 0.1

    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        k_w, k_x, k_n = jax.random.split(key, 3)
        w = self.weight_std * jax.random.normal(
            k_w, (batch_size, self.num_features), dtype=jnp.float32
        )
        x = jax.random.uniform(
            k_x, (batch_size, seq_len, self.num_features), dtype=jnp.float32
        )
        y_clean = jnp.einsum("bf,btf->bt", w, x)
        y = y_clean + self.noisy_std * jax.random.normal(k_n, y_clean.shape)
        return x, y, y_clean

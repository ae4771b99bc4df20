"""Fixed-hyperparameter GP prior — the north-star prior.

Parity: reference priors/fast_gp.py:36-58 — x ~ U(0,1)^(B,T,F) (or an
equidistant grid for F=1), y drawn in one shot from the GP prior plus
Gaussian likelihood noise (RBF kernel scaled by outputscale, constant zero
mean). Default hyperparameters match the reference's ``{noise: .1,
outputscale: .1, lengthscale: .1}`` (fast_gp.py:40).

The gpytorch Cholesky sampling path (fast_gp.py:53-56) is replaced by the
fused on-device sampler :func:`pfn_tpu.ops.gp_sample.gp_sample_paths`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pfn_tpu.ops.gp_sample import (
    gp_sample_paths,
    gp_sample_paths_grid,
    rbf_kernel,
)


@dataclasses.dataclass(frozen=True)
class GPPrior:
    num_features: int = 1
    num_outputs: int = 1
    noise: float = 0.1
    outputscale: float = 0.1
    lengthscale: float = 0.1
    equidistant_x: bool = False
    # > 0: grid fast path (1-D only) — latent f drawn on a fixed G-point
    # grid via a precomputed f64 Cholesky factor, x read off the grid; no
    # per-step Cholesky at all. See ops.gp_sample.gp_sample_paths_grid for
    # the approximation argument. 2048 is a good default when enabling.
    grid: int = 0

    def hyperparameters(self) -> dict:
        return {
            "noise": self.noise,
            "outputscale": self.outputscale,
            "lengthscale": self.lengthscale,
        }

    def sample_x(self, key: jax.Array, batch_size: int, seq_len: int) -> jax.Array:
        if self.equidistant_x:
            assert self.num_features == 1
            grid = jnp.linspace(0.0, 1.0, seq_len)
            return jnp.broadcast_to(
                grid[None, :, None], (batch_size, seq_len, 1)
            ).astype(jnp.float32)
        return jax.random.uniform(
            key, (batch_size, seq_len, self.num_features), dtype=jnp.float32
        )

    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        if self.grid > 0:
            assert self.num_features == 1 and not self.equidistant_x, (
                "grid fast path is 1-D continuous-x only"
            )
            x, y = gp_sample_paths_grid(
                key, batch_size, seq_len, self.grid,
                self.lengthscale, self.outputscale, self.noise,
            )
            return x, y, y
        k_x, k_y = jax.random.split(key)
        x = self.sample_x(k_x, batch_size, seq_len)
        y = gp_sample_paths(
            k_y,
            x,
            lengthscale=self.lengthscale,
            outputscale=self.outputscale,
            noise=self.noise,
            kernel=rbf_kernel,
        )
        return x, y, y

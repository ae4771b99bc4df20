"""GP hyperprior-mixture prior (Matern-5/2 ARD with Gamma hyperpriors).

Parity: reference priors/fast_gp_mix.py:24-134 — a botorch ``SingleTaskGP``
with Gamma hyperpriors (noise concentration 1.1 / rate 0.05, per-dimension
lengthscale 3.0 / 6.0, outputscale 0.5 / 0.15; fast_gp_mix.py:26,43,46),
hyperparameters drawn fresh per group of ``batch_size_per_gp_sample``
datasets (:76,87-88), optional y min-max-norm / sigmoid squash (:100-103),
and rejection re-sampling of datasets whose y leaves ``fix_to_range``
(:95-122 — here a bounded ``lax.while_loop`` that re-draws only the
out-of-range datasets, keeping the group's hyper draw fixed like the
reference does; out-of-range residue after ``max_retries`` is clipped).

TPU-native: hypers have shape (groups, ...) broadcast to the batch, and the
whole sampler (gamma draws, kernel build, batched Cholesky, rejection loop)
is one pure jittable function.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pfn_tpu.ops.gp_sample import gp_sample_paths, matern52_kernel


def _gamma(key, concentration, rate, shape):
    return jax.random.gamma(key, concentration, shape, dtype=jnp.float32) / rate


@dataclasses.dataclass(frozen=True)
class GPMixPrior:
    num_features: int = 1
    num_outputs: int = 1
    batch_size_per_gp_sample: int | None = None
    noise_concentration: float = 1.1
    noise_rate: float = 0.05
    lengthscale_concentration: float = 3.0
    lengthscale_rate: float = 6.0
    outputscale_concentration: float = 0.5
    outputscale_rate: float = 0.15
    y_minmax_norm: bool = False
    sigmoid: bool = False
    fix_to_range: tuple | None = None
    max_retries: int = 8
    equidistant_x: bool = False

    def _group_size(self, batch_size: int) -> int:
        from pfn_tpu.priors.base import default_group_size

        g = self.batch_size_per_gp_sample or default_group_size(batch_size, 10)
        assert batch_size % g == 0, (
            "batch_size must be divisible by batch_size_per_gp_sample"
        )
        return g

    def sample_hypers(self, key: jax.Array, batch_size: int):
        """Draw per-group hypers and broadcast to a (B, ...) leading axis."""
        g = self._group_size(batch_size)
        num_groups = batch_size // g
        k_n, k_l, k_o = jax.random.split(key, 3)
        noise = _gamma(k_n, self.noise_concentration, self.noise_rate, (num_groups,))
        lengthscale = _gamma(
            k_l,
            self.lengthscale_concentration,
            self.lengthscale_rate,
            (num_groups, self.num_features),
        )
        outputscale = _gamma(
            k_o, self.outputscale_concentration, self.outputscale_rate, (num_groups,)
        )
        rep = lambda h: jnp.repeat(h, g, axis=0)
        return rep(noise), rep(lengthscale), rep(outputscale)

    def _sample_x(self, key, batch_size, seq_len):
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
        k_h, k_x, k_y, k_retry = jax.random.split(key, 4)
        noise, lengthscale, outputscale = self.sample_hypers(k_h, batch_size)

        def draw(kx, ky):
            x = self._sample_x(kx, batch_size, seq_len)
            y = gp_sample_paths(
                ky, x, lengthscale, outputscale, noise, kernel=matern52_kernel
            )
            if self.y_minmax_norm:
                y_min = y.min(axis=1, keepdims=True)
                y_max = y.max(axis=1, keepdims=True)
                y = (y - y_min) / jnp.maximum(y_max - y_min, 1e-9)
            if self.sigmoid:
                y = jax.nn.sigmoid(y)
            return x, y

        x, y = draw(k_x, k_y)

        if self.fix_to_range is not None:
            lo, hi = self.fix_to_range
            in_range = lambda yy: ((yy >= lo) & (yy < hi)).all(axis=1)  # (B,)

            def cond(state):
                i, _key, _x, yy = state
                return (i < self.max_retries) & (~in_range(yy)).any()

            def body(state):
                i, rkey, xx, yy = state
                rkey, kx, ky = jax.random.split(rkey, 3)
                nx, ny = draw(kx, ky)
                keep = in_range(yy)  # keep already-valid datasets untouched
                xx = jnp.where(keep[:, None, None], xx, nx)
                yy = jnp.where(keep[:, None], yy, ny)
                return i + 1, rkey, xx, yy

            _, _, x, y = jax.lax.while_loop(cond, body, (0, k_retry, x, y))
            # Residue that never landed in range after max_retries: clip (the
            # reference loops forever and prints a warning, :112-117).
            y = jnp.clip(y, lo, hi - 1e-6)

        return x, y, y

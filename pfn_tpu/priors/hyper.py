"""Device-side hyper-hyperparameter samplers.

Parity: the host-side sampler lambdas of reference priors/utils.py:64-70
(trunc_norm / beta / gamma / uniform / uniform_int / zipf / scaled_beta).
Here each spec is a small frozen dataclass with a pure ``sample(key, shape)``
so that *meta-level* randomness (which MLP depth? which init std?) also runs
inside the jitted prior — nothing is drawn on the host.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


class HyperSpec:
    def sample(self, key: jax.Array, shape=()) -> jax.Array:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Constant(HyperSpec):
    value: float

    def sample(self, key, shape=()):
        return jnp.full(shape, self.value, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class Uniform(HyperSpec):
    low: float
    high: float

    def sample(self, key, shape=()):
        return jax.random.uniform(
            key, shape, minval=self.low, maxval=self.high, dtype=jnp.float32
        )


@dataclasses.dataclass(frozen=True)
class LogUniform(HyperSpec):
    low: float
    high: float

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape, dtype=jnp.float32)
        return jnp.exp(
            jnp.log(self.low) + u * (jnp.log(self.high) - jnp.log(self.low))
        )


@dataclasses.dataclass(frozen=True)
class UniformInt(HyperSpec):
    """Integer-valued uniform over [low, high) (priors/utils.py:68)."""

    low: int
    high: int

    def sample(self, key, shape=()):
        return jax.random.randint(key, shape, self.low, self.high)


@dataclasses.dataclass(frozen=True)
class TruncNorm(HyperSpec):
    """N(mu, sigma) truncated to [0, 1] (priors/utils.py:64)."""

    mu: float
    sigma: float

    def sample(self, key, shape=()):
        a = (0.0 - self.mu) / self.sigma
        b = (1.0 - self.mu) / self.sigma
        return self.mu + self.sigma * jax.random.truncated_normal(
            key, a, b, shape, dtype=jnp.float32
        )


@dataclasses.dataclass(frozen=True)
class Beta(HyperSpec):
    a: float
    b: float

    def sample(self, key, shape=()):
        return jax.random.beta(key, self.a, self.b, shape, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class Gamma(HyperSpec):
    """Gamma(concentration=a, scale=b) like np.random.gamma(a, b)
    (priors/utils.py:66)."""

    a: float
    b: float

    def sample(self, key, shape=()):
        return self.b * jax.random.gamma(key, self.a, shape, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class ScaledBeta(HyperSpec):
    """minimum + round(Beta(a,b) * (scale - minimum + 1) - .5) — integer-ish
    (priors/utils.py:70)."""

    a: float
    b: float
    scale: float
    minimum: float = 0.0

    def sample(self, key, shape=()):
        z = jax.random.beta(key, self.a, self.b, shape, dtype=jnp.float32)
        return self.minimum + jnp.round(
            z * (self.scale - self.minimum + 1.0) - 0.5
        )

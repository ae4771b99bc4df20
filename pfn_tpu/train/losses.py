"""Criterions: per-position losses mapping (logits, targets) -> (B, T).

Parity: the reference Losses registry (train.py:14-19) and the per-criterion
wiring in the train loop (train.py:34-39 for output width, :78-92 for loss
computation):
  * GaussianNLL(full=True) with a 2-wide head (mean, |var|)
  * MSE / BCE with 1-wide heads
  * CrossEntropy with num_classes-wide head
  * Bar / FullSupportBar distributions (the distributional regression head)

A Criterion bundles the loss function with the head-width rule so model
construction and the train step share one object (the reference attaches the
criterion onto the model instead, train.py:45).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from pfn_tpu.distributions.bar import BarDistribution, FullSupportBarDistribution

_LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class Criterion:
    kind: str = struct.field(pytree_node=False)
    bar: BarDistribution | None = None
    num_classes: int = struct.field(pytree_node=False, default=1)

    def n_out(self, num_outputs: int) -> int:
        """Head width rule (reference train.py:34-39)."""
        if self.kind == "gaussian":
            return num_outputs * 2
        if self.kind in ("bar", "full_bar"):
            assert num_outputs == 1
            return self.bar.num_bars
        if self.kind == "ce":
            return self.num_classes
        return num_outputs

    def per_position(self, output: jax.Array, targets: jax.Array) -> jax.Array:
        """output: (B, T, n_out); targets: (B, T) -> losses (B, T)."""
        if self.kind in ("bar", "full_bar"):
            return self.bar.nll(output, targets)
        if self.kind == "gaussian":
            # nn.GaussianNLLLoss(full=True): 0.5*(log(2*pi*var) + (y-m)^2/var)
            # with var = |second head| (train.py:82-84), eps-clamped like torch.
            mean = output[..., 0]
            var = jnp.maximum(jnp.abs(output[..., 1]), 1e-6)
            return 0.5 * (_LOG_2PI + jnp.log(var) + (targets - mean) ** 2 / var)
        if self.kind == "mse":
            return (output[..., 0] - targets) ** 2
        if self.kind == "bce":
            logits = output[..., 0]
            return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
                jnp.exp(-jnp.abs(logits))
            )
        if self.kind == "ce":
            # targets may be float labels (priors emit floats); ignore_index
            # -100 parity (used by stroke/omniglot priors, stroke.py:97-103).
            labels = targets.astype(jnp.int32)
            logp = jax.nn.log_softmax(output, axis=-1)
            picked = jnp.take_along_axis(
                logp, jnp.clip(labels, 0, self.num_classes - 1)[..., None], axis=-1
            )[..., 0]
            return jnp.where(labels == -100, 0.0, -picked)
        raise ValueError(f"unknown criterion kind {self.kind!r}")

    def valid_weight(self, targets: jax.Array) -> jax.Array:
        """Per-position contribution weight for masked-mean normalization.

        CE ignores ignore_index (-100) targets, and torch's
        ``CrossEntropyLoss(ignore_index=-100)`` (reference train.py:75-92)
        MEANS over the non-ignored elements only — so ignored positions must
        not inflate the denominator. All other criterions score every
        position.
        """
        if self.kind == "ce":
            return (targets.astype(jnp.int32) != -100).astype(jnp.float32)
        return jnp.ones(targets.shape, jnp.float32)

    def mean(self, logits):
        assert self.kind in ("bar", "full_bar")
        return self.bar.mean(logits)


def bar_criterion(borders) -> Criterion:
    return Criterion(kind="bar", bar=BarDistribution.create(borders))


def full_support_bar_criterion(borders) -> Criterion:
    return Criterion(kind="full_bar", bar=FullSupportBarDistribution.create(borders))


def gaussian_nll_criterion() -> Criterion:
    return Criterion(kind="gaussian")


def mse_criterion() -> Criterion:
    return Criterion(kind="mse")


def ce_criterion(num_classes: int) -> Criterion:
    return Criterion(kind="ce", num_classes=num_classes)


def bce_criterion() -> Criterion:
    return Criterion(kind="bce")

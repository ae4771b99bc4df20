"""Data transforms shared by priors.

Parity: reference priors/utils.py — normalize_data (:73-78, z-score over the
sequence axis), normalize_by_used_features_f (:81-82), Binarize-by-median
(:85-91), order_by_y (:94-100). Batch-first layout: the sequence axis is 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_data(data: jax.Array, axis: int = 1) -> jax.Array:
    """Z-score along the sequence axis (reference priors/utils.py:73-78; the
    reference normalizes over dim 0 because it is seq-first)."""
    mean = data.mean(axis=axis, keepdims=True)
    std = data.std(axis=axis, keepdims=True) + 1e-6
    return (data - mean) / std


def normalize_by_used_features(
    x: jax.Array, num_features_used, num_features: int
) -> jax.Array:
    """Rescale when only a subset of features carries signal and the rest is
    zero-padding (reference priors/utils.py:81-82)."""
    return x / (num_features_used / num_features)


def binarize_by_median(y: jax.Array, axis: int = 1) -> jax.Array:
    """Per-dataset median threshold -> {0., 1.} labels.

    The reference's Binarize module thresholds at the *global* batch median
    (priors/utils.py:85-91); per-dataset is the behavior its tabular/BNN
    usage intends (each sequence is an independent dataset), so we threshold
    along the sequence axis.
    """
    med = jnp.median(y, axis=axis, keepdims=True)
    return (y > med).astype(jnp.float32)


def order_by_y(key: jax.Array, x: jax.Array, y: jax.Array):
    """Sort each dataset by y (random direction), then interleave the two
    halves (reference priors/utils.py:94-100). x: (B,T,F), y: (B,T)."""
    B, T = y.shape
    sign = jnp.where(jax.random.bernoulli(key, shape=(B, 1)), 1.0, -1.0)
    order = jnp.argsort(sign * y, axis=1)
    order = order.reshape(B, 2, -1).transpose(0, 2, 1).reshape(B, -1)
    x = jnp.take_along_axis(x, order[..., None], axis=1)
    y = jnp.take_along_axis(y, order, axis=1)
    return x, y

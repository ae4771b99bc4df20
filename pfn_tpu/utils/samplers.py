"""Evaluation-position (``single_eval_pos``) samplers.

The reference samples the train/eval split position on the host each step
(reference utils.py:59-73, train.py:69). Here the samplers are pure functions
of a PRNG key so the draw happens *inside* the jitted train step, keeping the
whole step fused on device. ``single_eval_pos`` then feeds loss masking and
the attention op as a traced scalar — no recompilation across draws.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_eval_pos_weights(
    max_len: int,
    kind: str = "weighted",
    mixture_floor: float = 0.1,
    mixture_cap: int = 300,
) -> jnp.ndarray:
    """Unnormalized weights over positions 0..max_len-1.

    ``weighted``: p(i) ∝ 1/(max_len - i) — favors long contexts, parity with
    get_weighted_single_eval_pos_sampler (reference utils.py:59-65).
    ``uniform``: parity with get_uniform_single_eval_pos_sampler (:68-73).
    ``mixture``: (1 - mixture_floor)·weighted + mixture_floor·uniform over
    the first min(mixture_cap, max_len) positions. The ``weighted`` sampler
    puts so little mass on small contexts at large max_len (p(i<50) ≈ 2% at
    max_len=2000) that small-context quality starves; the uniform floor
    guarantees coverage in ONE training schedule instead of a post-hoc
    small-context finetune. No reference equivalent (utils.py has only the
    two pure samplers).
    """
    if kind == "weighted":
        return 1.0 / (max_len - jnp.arange(max_len, dtype=jnp.float32))
    if kind == "uniform":
        return jnp.ones(max_len, dtype=jnp.float32)
    if kind == "mixture":
        w = 1.0 / (max_len - jnp.arange(max_len, dtype=jnp.float32))
        w = w / w.sum()
        cap = min(mixture_cap, max_len)
        u = jnp.where(jnp.arange(max_len) < cap, 1.0 / cap, 0.0)
        return (1.0 - mixture_floor) * w + mixture_floor * u
    raise ValueError(f"unknown sampler kind {kind!r}")


def weighted_single_eval_pos(key: jax.Array, max_len: int) -> jax.Array:
    """Sample i ~ p(i) ∝ 1/(max_len - i) on device."""
    logits = jnp.log(make_eval_pos_weights(max_len, "weighted"))
    return jax.random.categorical(key, logits)


def uniform_single_eval_pos(key: jax.Array, max_len: int) -> jax.Array:
    """Sample i uniformly from [0, max_len) on device."""
    return jax.random.randint(key, (), 0, max_len)

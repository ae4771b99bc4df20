"""Learning-rate schedules and the parameter-count LR rule.

Parity targets: reference ``utils.py`` — cosine/linear warmup schedules
(:10-51) and the "OpenAI" LR rule (:54-56). The reference steps its scheduler
once per *epoch* (train.py:134); our optax schedules are expressed in
scheduler units, and the train loop converts steps→epochs before lookup so
the LR trajectory matches the reference exactly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
):
    """LR increases linearly 0→base over warmup, then follows a cosine decay.

    Parity: get_cosine_schedule_with_warmup (reference utils.py:10-22).
    Returns an optax-compatible ``schedule(count) -> lr``.
    """

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.float32)
        warmup = count / max(1, num_warmup_steps)
        progress = (count - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        cosine = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return base_lr * jnp.where(count < num_warmup_steps, warmup, cosine)

    return schedule


def linear_schedule_with_warmup(
    base_lr: float, num_warmup_steps: int, num_training_steps: int
):
    """Parity: get_linear_schedule_with_warmup (reference utils.py:25-51)."""

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.float32)
        warmup = count / max(1, num_warmup_steps)
        decay = jnp.maximum(
            0.0,
            (num_training_steps - count)
            / max(1, num_training_steps - num_warmup_steps),
        )
        return base_lr * jnp.where(count < num_warmup_steps, warmup, decay)

    return schedule


def get_openai_lr(num_params: int) -> float:
    """Max LR from parameter count; parity: reference utils.py:54-56."""
    return 0.003239 - 0.0001395 * math.log(num_params)

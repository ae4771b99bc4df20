"""Batch-level prior mixture: split each batch between component priors.

The reference trains each PFN on a single prior family; its follow-up
direction (differentiable hyperparameters / TabPFN's SCM+GP blend) mixes
structurally different priors so the amortized posterior stays calibrated
on data far from any one component. This combinator brings that to the
framework the TPU-native way: the per-component batch allocation is
STATIC (computed at trace time from the mixture weights by largest
remainder), so every component samples a fixed-shape sub-batch and the
result is one `jnp.concatenate` — no dynamic shapes, no host control
flow, fully jit/vmap/shard-compatible like every other Prior.

Motivation (measured, round 4): the tabular epochs-scaling A/B showed
the 300->1000-epoch PFN converging *away* from real datasets the MLP
prior mis-models (docs/PERF.md "Epochs scaling (round 4)"): the gap is
prior-limited, and prior diversity is the identified lever.

Components must agree on ``num_outputs``; feature widths may differ —
narrower components are zero-padded on the right to the widest
``num_features`` (matching the zero-padding convention real datasets use
at eval time, experiments/tabular_eval.py).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from pfn_tpu.priors.base import Prior


def _allocate(batch_size: int, weights: Sequence[float]) -> Tuple[int, ...]:
    """Largest-remainder allocation of ``batch_size`` rows to components.

    Static (pure Python on trace-time constants). Every component with a
    positive weight gets at least one row when batch_size >= n_components.
    """
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("mixture weights must have a positive sum")
    shares = [batch_size * float(w) / total for w in weights]
    counts = [int(s) for s in shares]
    # Guarantee >=1 row per positive-weight component before distributing
    # the remainder (a 0-row component would make its sample() shape (0,...),
    # which XLA handles but wastes a compiled computation).
    if batch_size >= len(weights):
        counts = [max(c, 1) if w > 0 else c for c, w in zip(counts, weights)]
    while sum(counts) > batch_size:
        i = max(range(len(counts)), key=lambda j: counts[j])
        counts[i] -= 1
    rema = [s - c for s, c in zip(shares, counts)]
    while sum(counts) < batch_size:
        i = max(range(len(counts)), key=lambda j: rema[j])
        counts[i] += 1
        rema[i] = -1.0
    return tuple(counts)


@dataclasses.dataclass(frozen=True)
class BatchMixture:
    """Sample each batch as a static split across component priors.

    weights are relative (need not sum to 1). The split is deterministic
    given (batch_size, weights) — reshuffling across the batch axis is
    unnecessary because the training loss is a mean over datasets.
    """

    components: Tuple[Prior, ...]
    weights: Tuple[float, ...]

    def __post_init__(self):
        if len(self.components) != len(self.weights):
            raise ValueError("components and weights must align")
        if not self.components:
            raise ValueError("need at least one component")
        outs = {p.num_outputs for p in self.components}
        if len(outs) != 1:
            raise ValueError(f"components disagree on num_outputs: {outs}")

    @property
    def num_features(self) -> int:
        return max(p.num_features for p in self.components)

    @property
    def num_outputs(self) -> int:
        return self.components[0].num_outputs

    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        counts = _allocate(batch_size, self.weights)
        keys = jax.random.split(key, len(self.components))
        xs, ys, ts = [], [], []
        width = self.num_features
        for prior, n, k in zip(self.components, counts, keys):
            if n == 0:
                continue
            x, y, t = prior.sample(k, n, seq_len)
            pad = width - x.shape[-1]
            if pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            xs.append(x)
            ys.append(y)
            ts.append(t)
        return (
            jnp.concatenate(xs, axis=0),
            jnp.concatenate(ys, axis=0),
            jnp.concatenate(ts, axis=0),
        )

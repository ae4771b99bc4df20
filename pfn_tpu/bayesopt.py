"""Bayesian optimization on top of a trained PFN.

Parity: the reference ships a truncated botorch ``ExpectedImprovement`` stub
(acquisition_functions.py:5-16); its *working* EI lives on the bar head
(bar_distribution.py:69-80, mirrored at
:meth:`pfn_tpu.distributions.BarDistribution.ei`). Per SURVEY.md §2 row 20
the intended API to restore is acquisition functions over the PFN posterior
plus a candidate-selection loop — implemented here TPU-natively: ONE forward
pass scores every candidate (the observed points are the train context, the
candidate pool the eval positions), so an entire BO iteration is a single
jitted call.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from pfn_tpu.distributions.bar import BarDistribution


# ---- acquisition functions over bar-head logits ---------------------------

def expected_improvement(
    bar: BarDistribution, logits: jax.Array, best_f, maximize: bool = True
) -> jax.Array:
    """EI under the piecewise-constant posterior (bar_distribution.py:69-80)."""
    return bar.ei(logits, best_f, maximize=maximize)


def probability_of_improvement(
    bar: BarDistribution, logits: jax.Array, best_f, maximize: bool = True
) -> jax.Array:
    """P(y > best_f) (or < for minimize) under the bar posterior."""
    y = jnp.broadcast_to(jnp.asarray(best_f, jnp.float32), logits.shape[:-1])
    cdf = bar.cdf(logits, y)
    return 1.0 - cdf if maximize else cdf


def upper_confidence_bound(
    bar: BarDistribution, logits: jax.Array, beta: float = 1.0,
    maximize: bool = True,
) -> jax.Array:
    """mean ± beta * std, with std from the bucket second moment."""
    probs = jax.nn.softmax(logits, axis=-1)
    mean = bar.mean(logits)
    second = jnp.sum(probs * bar.bucket_means**2, axis=-1)
    std = jnp.sqrt(jnp.maximum(second - mean**2, 0.0))
    return mean + beta * std if maximize else -(mean - beta * std)


def thompson_sample(
    bar: BarDistribution, logits: jax.Array, key: jax.Array
) -> jax.Array:
    """One posterior draw per candidate — Thompson sampling acquisition."""
    return bar.sample(key, logits)


ACQUISITIONS: dict[str, Callable] = {
    "ei": expected_improvement,
    "pi": probability_of_improvement,
    "ucb": upper_confidence_bound,
}


# ---- the PFN-BO loop -------------------------------------------------------

@dataclasses.dataclass
class PFNOptimizer:
    """Sequential model-based optimization driven by a trained PFN.

    The PFN *is* the surrogate: conditioning on observations is one forward
    pass (no GP refit — the amortization the paper sells). ``max_obs`` fixes
    the context length so every BO iteration reuses one compiled program;
    unused context slots are masked by ``single_eval_pos``.
    """

    model: object  # PFNTransformer
    params: object
    bar: BarDistribution
    acquisition: str = "ei"
    maximize: bool = True
    beta: float = 1.0  # for ucb

    def scores(
        self, x_obs: jax.Array, y_obs: jax.Array, candidates: jax.Array,
        num_obs=None,
    ) -> jax.Array:
        """Acquisition value for each candidate.

        x_obs: (N, F) observed inputs (N static; pad + pass num_obs to mask),
        y_obs: (N,), candidates: (M, F). Returns (M,).
        """
        n = x_obs.shape[0] if num_obs is None else num_obs
        x = jnp.concatenate([x_obs, candidates], axis=0)[None]  # (1, N+M, F)
        y = jnp.concatenate(
            [y_obs, jnp.zeros(candidates.shape[0], y_obs.dtype)]
        )[None]
        logits = self.model.apply(self.params, x, y, n)
        cand_logits = logits[0, x_obs.shape[0] :, :]
        if self.acquisition == "ucb":
            return upper_confidence_bound(
                self.bar, cand_logits, beta=self.beta, maximize=self.maximize
            )
        # Masked best-so-far: n may be a traced scalar (padded context), so
        # never slice by it.
        obs_mask = jnp.arange(x_obs.shape[0]) < n
        best_f = (
            jnp.max(jnp.where(obs_mask, y_obs, -jnp.inf))
            if self.maximize
            else jnp.min(jnp.where(obs_mask, y_obs, jnp.inf))
        )
        return ACQUISITIONS[self.acquisition](
            self.bar, cand_logits, best_f, maximize=self.maximize
        )

    def propose(self, x_obs, y_obs, candidates, num_obs=None) -> jax.Array:
        """Index of the best candidate under the acquisition."""
        return jnp.argmax(self.scores(x_obs, y_obs, candidates, num_obs))


def optimize(
    objective: Callable[[jax.Array], float],
    optimizer: PFNOptimizer,
    candidates: jax.Array,
    num_iterations: int,
    key: jax.Array,
    num_init: int = 2,
):
    """Run a BO loop over a finite candidate set.

    Returns (x_obs, y_obs) arrays of everything evaluated. The context is
    padded to ``num_init + num_iterations`` so the jitted score function
    compiles once.
    """
    import numpy as np

    M, F = candidates.shape
    N = num_init + num_iterations
    assert N <= M, (
        f"budget num_init+num_iterations={N} exceeds the candidate pool "
        f"(M={M}) — every point would be evaluated before the loop ends"
    )
    key, sub = jax.random.split(key)
    init_idx = jax.random.permutation(sub, M)[:num_init]

    x_obs = jnp.zeros((N, F), candidates.dtype)
    y_obs = jnp.zeros((N,), jnp.float32)
    evaluated = np.zeros(M, bool)  # finite pool: never re-spend budget
    for i, idx in enumerate(init_idx):
        evaluated[int(idx)] = True
        x_obs = x_obs.at[i].set(candidates[idx])
        y_obs = y_obs.at[i].set(objective(candidates[idx]))

    score_jit = jax.jit(optimizer.scores)
    for t in range(num_iterations):
        n = num_init + t
        s = np.array(score_jit(x_obs, y_obs, candidates, num_obs=n))
        s[evaluated] = -np.inf
        pick = int(s.argmax())
        evaluated[pick] = True
        x_new = candidates[pick]
        x_obs = x_obs.at[n].set(x_new)
        y_obs = y_obs.at[n].set(objective(x_new))
    return x_obs, y_obs

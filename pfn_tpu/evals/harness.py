"""PFN evaluation harness: amortized posterior prediction + positional sweeps.

Parity targets: the ``run_test`` NLL/MSE-vs-eval-position loop of the GP
notebook (reference notebooks/SetupForGPFittingExperiments.ipynb cell 6) and
the generic amortized-inference call pattern (SURVEY.md §3.2): pack context +
queries, one forward with ``single_eval_pos = len(context)``, summarize
posterior from the head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pfn_predict(model, params, x, y, single_eval_pos):
    """One amortized-inference forward pass.

    x: (B, T, F) with context rows [0, sep) and query rows [sep, T);
    y: (B, T) with query entries ignored (any value). Returns logits
    (B, T, n_out); rows >= sep are the posterior predictions.
    """
    pos = jnp.arange(x.shape[1])[None, :]
    y_ctx = jnp.where(pos < single_eval_pos, y, 0.0)
    return model.apply(params, x, y_ctx, single_eval_pos)


@functools.partial(jax.jit, static_argnums=(0,))
def _positional_losses(model, params, criterion, x, y, target_y, positions):
    def one(sep):
        out = pfn_predict(model, params, x, y, sep)
        losses = criterion.per_position(out, target_y)  # (B, T)
        # Score only the FIRST eval position (== sep), the run_test protocol.
        return losses[:, sep].mean(), losses[:, sep].std()

    return jax.lax.map(one, positions)


@functools.partial(jax.jit, static_argnums=(0,))
def _positional_losses_per_dataset(
    model, params, criterion, x, y, target_y, positions
):
    def one(sep):
        out = pfn_predict(model, params, x, y, sep)
        losses = criterion.per_position(out, target_y)  # (B, T)
        return losses[:, sep]  # (B,)

    return jax.lax.map(one, positions)  # (P, B)


def eval_positional_loss_per_dataset(
    model, params, criterion, x, y, target_y=None, positions=None
):
    """Per-dataset variant of :func:`eval_positional_loss`: returns the raw
    (len(positions), B) loss matrix instead of its batch mean/std.

    Per-position NLL is heavy-tailed across prior draws (one hard dataset
    can dominate a 32-draw mean), so robust summaries (median, bootstrap
    CIs) and chunked large-sample evals need the per-dataset values.
    """
    T = x.shape[1]
    positions = (
        jnp.arange(1, T) if positions is None else jnp.asarray(positions)
    )
    if target_y is None:
        target_y = y
    return _positional_losses_per_dataset(
        model, params, criterion, x, y, target_y, positions
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _positional_logits(model, params, x, y, positions):
    def one(sep):
        out = pfn_predict(model, params, x, y, sep)
        return out[:, sep, :]  # (B, n_out)

    return jax.lax.map(one, positions)  # (P, B, n_out)


def eval_positional_logits_per_dataset(model, params, x, y, positions):
    """Raw head outputs at each context size: (len(positions), B, n_out).

    The logits at row t of a forward with single_eval_pos=t — the PFN's
    posterior predictive for dataset b at context size t. Feeds analytic
    scoring against a Gaussian oracle (BarDistribution.gaussian_cross_entropy)
    where the per-draw NLL of :func:`eval_positional_loss_per_dataset` would
    carry the query-sample noise.
    """
    return _positional_logits(model, params, x, y, jnp.asarray(positions))


def eval_positional_loss(
    model,
    params,
    criterion,
    x,
    y,
    target_y=None,
    positions=None,
):
    """Loss of the PFN posterior at context sizes ``positions``.

    For each t in positions: forward with single_eval_pos=t and score the
    prediction at row t — the Fig-3a model curve (NLL vs #context points).
    Returns (mean_losses (len(positions),), std_losses).
    """
    T = x.shape[1]
    if positions is None:
        positions = jnp.arange(1, T)
    else:
        positions = jnp.asarray(positions)
    if target_y is None:
        target_y = y
    return _positional_losses(model, params, criterion, x, y, target_y, positions)


def make_mean_mse_validator(
    prior,
    criterion,
    batch_size: int = 32,
    seq_len: int = 50,
    positions=None,
    seed: int = 0,
):
    """Build a ``validate_fn(model, params) -> float`` for the train loop.

    Parity: the gp-mix DataLoader.validate hook (reference
    fast_gp_mix.py:139-153) — regenerate a fixed batch, sweep eval positions,
    and score the MSE of the posterior-mean prediction against target_y over
    the eval rows. Works for any prior + bar-style criterion (anything with
    ``.mean(logits)``).
    """
    pos = jnp.asarray(
        positions
        if positions is not None
        else jnp.arange(1, seq_len, max(1, seq_len // 10))
    )
    # Jitted once per validator — validate_fn must reuse these function
    # objects or every validation epoch recompiles the whole sweep.
    sample_jit = jax.jit(lambda k: prior.sample(k, batch_size, seq_len))

    @functools.lru_cache(maxsize=None)
    def _sweep_for(model):
        @functools.partial(jax.jit, donate_argnums=())
        def sweep(params, x, y, target_y):
            def one(sep):
                logits = pfn_predict(model, params, x, y, sep)
                mean = criterion.mean(logits)  # (B, T)
                mask = jnp.arange(seq_len)[None, :] >= sep
                se = (mean - target_y) ** 2
                return jnp.sum(se * mask) / jnp.maximum(jnp.sum(mask), 1)

            return jax.lax.map(one, pos).mean()

        return sweep

    def validate_fn(model, params):
        x, y, target_y = sample_jit(jax.random.PRNGKey(seed))
        return float(_sweep_for(model)(params, x, y, target_y))

    return validate_fn

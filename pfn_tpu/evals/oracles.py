"""Exact-posterior oracles — the ground truth the amortized PFN is scored
against (the reference's "integration tests", SURVEY.md §4).

  * :func:`gp_exact_evaluate` — exact GP posterior NLL/MSE swept over context
    sizes; parity with reference priors/fast_gp.py:88-120 (per-t refit loop)
    but vectorized: ONE kernel matrix per batch element and a context-mask
    trick turn the sweep into a batched Cholesky per (t, dataset) pair, all
    on device.
  * :func:`ridge_evaluate` — ridge point-prediction MSE vs the noise-free
    targets; parity with reference priors/ridge.py:22-34 (sklearn Ridge with
    intercept, refit per t) in closed form.
  * :func:`bayes_linreg_posterior` — exact Bayesian linear regression
    posterior predictive (the closed-form oracle for the ridge prior's
    posterior; the reference has no direct equivalent but uses Ridge as an
    approximation).
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp

from pfn_tpu.ops.gp_sample import gp_posterior, rbf_kernel

_LOG_2PI = math.log(2.0 * math.pi)


def _gaussian_nll(y, mean, var):
    return 0.5 * (_LOG_2PI + jnp.log(var) + (y - mean) ** 2 / var)


def gp_exact_evaluate(
    x: jax.Array,
    y: jax.Array,
    hyperparameters: dict | None = None,
    use_mse: bool = False,
    kernel=rbf_kernel,
    step_size: int = 1,
    start_pos: int = 0,
    positions=None,
    dtype=jnp.float32,
):
    """Exact GP posterior loss at x[t] given (x[:t], y[:t]) for t sweeping the
    sequence. x: (B, T, F), y: (B, T) (batch-first; the reference is
    seq-first). Returns (all_losses (num_t, B), mean_losses (num_t(+1),),
    elapsed_seconds) like reference fast_gp.py:120 — with the same leading
    0.0 entry when start_pos == 0 (fast_gp.py:91). Pass ``positions`` to
    evaluate an explicit subset of context sizes (each t costs a full-size
    masked Cholesky, so a dense sweep at large T is expensive); mean_losses
    then aligns with ``positions`` (no leading zero).
    """
    hp = hyperparameters or {"noise": 0.1, "outputscale": 0.1, "lengthscale": 0.1}
    t0 = time.time()
    B, T, _ = x.shape
    if positions is not None:
        ts = jnp.asarray(positions)
        start_pos = 1  # suppress the leading-zero convention below
    else:
        ts = jnp.arange(max(start_pos, 1), T, step_size)

    @jax.jit
    def losses_for_all_t():
        def one_t(t):
            mask = jnp.arange(T) < t

            def one_b(xb, yb):
                mean, var = gp_posterior(
                    xb,
                    yb,
                    xb,  # query all points; we pick index t below
                    lengthscale=hp["lengthscale"],
                    outputscale=hp["outputscale"],
                    noise=hp["noise"],
                    kernel=kernel,
                    context_mask=mask,
                    dtype=dtype,
                )
                m = mean[t]
                v = var[t]
                if use_mse:
                    return (m - yb[t]) ** 2
                return _gaussian_nll(yb[t], m, v)

            return jax.vmap(one_b)(x, y)  # (B,)

        return jax.lax.map(one_t, ts)  # (num_t, B)

    all_losses = losses_for_all_t()
    mean_losses = all_losses.mean(axis=1)
    if start_pos == 0:
        mean_losses = jnp.concatenate([jnp.zeros(1), mean_losses])
    return all_losses, mean_losses, time.time() - t0


def gp_exact_posterior_moments(
    x: jax.Array,
    y: jax.Array,
    hyperparameters: dict | None = None,
    positions=None,
    kernel=rbf_kernel,
    dtype=jnp.float32,
):
    """Exact GP posterior predictive moments (mean, variance incl.
    observation noise) at x[t] given (x[:t], y[:t]) for each t in
    ``positions``. Same conditioning sweep as :func:`gp_exact_evaluate`
    (reference fast_gp.py:88-120) but returning the Gaussian itself instead
    of a single-sample NLL — the oracle side of the Rao-Blackwellized gap
    (see BarDistribution.gaussian_cross_entropy).

    x: (B, T, F), y: (B, T). Returns (means (P, B), vars (P, B)).
    """
    hp = hyperparameters or {"noise": 0.1, "outputscale": 0.1, "lengthscale": 0.1}
    B, T, _ = x.shape
    ts = jnp.arange(1, T) if positions is None else jnp.asarray(positions)

    @jax.jit
    def moments_for_all_t():
        def one_t(t):
            mask = jnp.arange(T) < t

            def one_b(xb, yb):
                mean, var = gp_posterior(
                    xb, yb, xb,
                    lengthscale=hp["lengthscale"],
                    outputscale=hp["outputscale"],
                    noise=hp["noise"],
                    kernel=kernel,
                    context_mask=mask,
                    dtype=dtype,
                )
                return mean[t], var[t]

            return jax.vmap(one_b)(x, y)  # ((B,), (B,))

        return jax.lax.map(one_t, ts)  # ((P, B), (P, B))

    return moments_for_all_t()


def ridge_evaluate(x: jax.Array, y: jax.Array, y_non_noisy: jax.Array, alpha: float = 0.0):
    """Ridge-regression point predictions (with intercept, like sklearn's
    default used at reference priors/ridge.py:28-30), refit at every context
    size t, scored as MSE against the noise-free targets.

    x: (B, T, F), y/y_non_noisy: (B, T). Returns (losses (T,), seconds) with
    losses[0] = 0 like the reference (ridge.py:24).
    """
    t0 = time.time()
    B, T, F = x.shape

    @jax.jit
    def all_t():
        def one_t(t):
            mask = (jnp.arange(T) < t).astype(jnp.float32)  # (T,)
            n = jnp.maximum(mask.sum(), 1.0)

            def one_b(xb, yb, yclean):
                xm = (xb * mask[:, None]).sum(0) / n
                ym = (yb * mask).sum(0) / n
                xc = (xb - xm) * mask[:, None]
                yc = (yb - ym) * mask
                A = xc.T @ xc + alpha * jnp.eye(F)
                # Guard t=1 (centered X is all zeros): solve on a ridge-ified
                # matrix; w -> 0, prediction -> mean(y) = sklearn behavior.
                w = jnp.linalg.solve(A + 1e-9 * jnp.eye(F), xc.T @ yc)
                pred = (xb[t] - xm) @ w + ym
                return (pred - yclean[t]) ** 2

            return jax.vmap(one_b)(x, y, y_non_noisy).mean()

        return jax.lax.map(one_t, jnp.arange(1, T))

    losses = jnp.concatenate([jnp.zeros(1), all_t()])
    return losses, time.time() - t0


def bayes_linreg_posterior(
    x_train: jax.Array,
    y_train: jax.Array,
    x_query: jax.Array,
    weight_std: float,
    noise_std: float,
    context_mask: jax.Array | None = None,
):
    """Exact Bayesian linear regression posterior predictive.

    Prior w ~ N(0, weight_std^2 I), y = x.w + N(0, noise_std^2). Returns
    (mean, var) of the posterior predictive at x_query (var includes noise).
    This is the closed-form oracle matching the RidgePrior's generative
    process exactly (priors/ridge.py:10-16).
    """
    F = x_train.shape[-1]
    s2w = weight_std**2
    s2n = noise_std**2
    xt = x_train
    yt = y_train
    if context_mask is not None:
        m = context_mask.astype(jnp.float32)
        xt = xt * m[:, None]
        yt = yt * m
    A = xt.T @ xt / s2n + jnp.eye(F) / s2w
    mu = jnp.linalg.solve(A, xt.T @ yt / s2n)
    Sigma = jnp.linalg.inv(A)
    mean = x_query @ mu
    var = jnp.einsum("qf,fg,qg->q", x_query, Sigma, x_query) + s2n
    return mean, var

"""GP-hyperprior-mixture oracles: MAP-fit GP and HMC over GP hyperparameters.

Parity: reference priors/fast_gp_mix.py —
  * ``get_fitted_model`` / ``evaluate`` (:156-169): per context size, MAP-fit
    the GP hyperparameters (type-II with Gamma hyperpriors, the job
    ``fit_gpytorch_model`` does) and score the exact posterior NLL at the
    next point;
  * ``get_mcmc_model`` / ``evaluate_`` (:171-268): sample the GP-hyper
    posterior with NUTS and score the *mixture* predictive — logsumexp of the
    per-sample Gaussian log-densities (``get_mean_logdensity``, :203-217).

TPU-native: the marginal likelihood uses the same context-mask trick as
:func:`pfn_tpu.evals.oracles.gp_exact_evaluate` (identity-padded covariance,
no dynamic shapes), MAP fits are a fixed-length optax adam loop vmapped over
datasets, and the NUTS role is played by the adaptive-HMC sampler of
:mod:`pfn_tpu.evals.inference` on log-hyperparameters — all jittable, no
per-(t, dataset) Python retry loops (cf. :236-256).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from pfn_tpu.evals.inference import hmc
from pfn_tpu.ops.gp_sample import matern52_kernel
from pfn_tpu.priors.gp_mix import GPMixPrior

_LOG_2PI = math.log(2.0 * math.pi)


def gp_marginal_log_likelihood(
    x: jax.Array,
    y: jax.Array,
    noise,
    lengthscale,
    outputscale,
    kernel: Callable = matern52_kernel,
    context_mask: jax.Array | None = None,
    jitter: float = 1e-6,
) -> jax.Array:
    """log N(y; 0, K + noise*I) for one dataset; masked rows excluded by the
    identity-padding trick (their Cholesky diagonal is 1 -> zero logdet and
    zero quadratic contribution)."""
    T = x.shape[0]
    K = kernel(x.astype(jnp.float32), x.astype(jnp.float32), lengthscale, outputscale)
    yv = y.astype(jnp.float32)
    if context_mask is not None:
        m = context_mask.astype(jnp.float32)
        K = K * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        A = K + jnp.diag(m) * (noise + jitter)
        yv = yv * m
        n = m.sum()
    else:
        A = K + (noise + jitter) * jnp.eye(T, dtype=jnp.float32)
        n = jnp.asarray(T, jnp.float32)
    L = jax.lax.linalg.cholesky(A)
    quad = yv @ jax.scipy.linalg.cho_solve((L, True), yv)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (quad + logdet + n * _LOG_2PI)


def _gamma_logpdf(x, concentration, rate):
    return (
        concentration * jnp.log(rate)
        - jax.scipy.special.gammaln(concentration)
        + (concentration - 1.0) * jnp.log(x)
        - rate * x
    )


def log_hyperprior(hp: dict, prior: GPMixPrior) -> jax.Array:
    """Gamma hyperprior log-density (reference fast_gp_mix.py:30-47)."""
    return (
        _gamma_logpdf(hp["noise"], prior.noise_concentration, prior.noise_rate)
        + jnp.sum(
            _gamma_logpdf(
                hp["lengthscale"],
                prior.lengthscale_concentration,
                prior.lengthscale_rate,
            )
        )
        + _gamma_logpdf(
            hp["outputscale"],
            prior.outputscale_concentration,
            prior.outputscale_rate,
        )
    )


def _unconstrained_log_posterior(x, y, prior, kernel, context_mask):
    """log p(theta | D) on theta = log(hp), including the exp Jacobian."""

    def lp(theta):
        hp = jax.tree.map(jnp.exp, theta)
        jac = sum(jnp.sum(t) for t in jax.tree.leaves(theta))
        return (
            gp_marginal_log_likelihood(
                x, y, hp["noise"], hp["lengthscale"], hp["outputscale"],
                kernel=kernel, context_mask=context_mask,
            )
            + log_hyperprior(hp, prior)
            + jac
        )

    return lp


def _init_theta(num_features: int) -> dict:
    return {
        "noise": jnp.log(jnp.asarray(0.05, jnp.float32)),
        "lengthscale": jnp.log(jnp.full((num_features,), 0.5, jnp.float32)),
        "outputscale": jnp.log(jnp.asarray(1.0, jnp.float32)),
    }


def gp_map_fit(
    x: jax.Array,
    y: jax.Array,
    prior: GPMixPrior,
    kernel: Callable = matern52_kernel,
    context_mask: jax.Array | None = None,
    steps: int = 150,
    lr: float = 0.05,
) -> dict:
    """MAP hyperparameters for one dataset (the fit_gpytorch_model role,
    reference fast_gp_mix.py:156-166): adam on log-hypers maximizing marginal
    likelihood + hyperprior."""
    lp = _unconstrained_log_posterior(x, y, prior, kernel, context_mask)
    theta = _init_theta(x.shape[-1])
    tx = optax.adam(lr)
    opt_state = tx.init(theta)

    def body(carry, _):
        theta, opt_state = carry
        loss, grads = jax.value_and_grad(lambda t: -lp(t))(theta)
        updates, opt_state = tx.update(grads, opt_state)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state), loss

    (theta, _), _ = jax.lax.scan(body, (theta, opt_state), None, length=steps)
    return jax.tree.map(jnp.exp, theta)


def gp_map_evaluate(
    x: jax.Array,
    y: jax.Array,
    prior: GPMixPrior,
    kernel: Callable = matern52_kernel,
    positions=None,
    steps: int = 150,
    lr: float = 0.05,
):
    """MAP-fit baseline NLL swept over context sizes.

    x: (B, T, F), y: (B, T). For each t in positions: MAP-fit hypers on
    (x[:t], y[:t]), then NLL of the exact posterior at x[t]. Returns
    (all_losses (num_t, B), mean_losses (num_t,)). Parity: evaluate with
    get_fitted_model (fast_gp_mix.py:156-169).
    """
    from pfn_tpu.ops.gp_sample import gp_posterior

    B, T, F = x.shape
    ts = jnp.asarray(positions if positions is not None else jnp.arange(1, T))

    @jax.jit
    def sweep():
        def one_t(t):
            mask = jnp.arange(T) < t

            def one_b(xb, yb):
                hp = gp_map_fit(
                    xb, yb, prior, kernel=kernel, context_mask=mask,
                    steps=steps, lr=lr,
                )
                mean, var = gp_posterior(
                    xb, yb, xb,
                    lengthscale=hp["lengthscale"],
                    outputscale=hp["outputscale"],
                    noise=hp["noise"],
                    kernel=kernel,
                    context_mask=mask,
                )
                return 0.5 * (
                    _LOG_2PI + jnp.log(var[t]) + (yb[t] - mean[t]) ** 2 / var[t]
                )

            return jax.vmap(one_b)(x, y)

        return jax.lax.map(one_t, ts)

    all_losses = sweep()
    return all_losses, all_losses.mean(axis=1)


def gp_hyper_mcmc_predictive(
    x_train: jax.Array,
    y_train: jax.Array,
    x_query: jax.Array,
    y_query: jax.Array,
    prior: GPMixPrior,
    key: jax.Array,
    kernel: Callable = matern52_kernel,
    num_samples: int = 64,
    num_warmup: int = 128,
    context_mask: jax.Array | None = None,
):
    """Mixture posterior-predictive NLL at query points for one dataset.

    HMC samples theta ~ p(hp | D); the predictive is the sample mixture
    logsumexp_s log N(y*; mean_s, var_s) - log S (parity: get_mean_logdensity,
    fast_gp_mix.py:203-217). Returns (nll (M,), accept_rate).
    """
    from pfn_tpu.ops.gp_sample import gp_posterior

    lp = _unconstrained_log_posterior(x_train, y_train, prior, kernel, context_mask)
    samples, accept = hmc(
        lp, _init_theta(x_train.shape[-1]), key,
        num_samples=num_samples, num_warmup=num_warmup,
    )

    def one_sample(theta):
        hp = jax.tree.map(jnp.exp, theta)
        mean, var = gp_posterior(
            x_train, y_train, x_query,
            lengthscale=hp["lengthscale"],
            outputscale=hp["outputscale"],
            noise=hp["noise"],
            kernel=kernel,
            context_mask=context_mask,
        )
        return -0.5 * (_LOG_2PI + jnp.log(var) + (y_query - mean) ** 2 / var)

    logdens = jax.vmap(one_sample)(samples)  # (S, M)
    nll = -(jax.scipy.special.logsumexp(logdens, axis=0) - jnp.log(logdens.shape[0]))
    return nll, accept

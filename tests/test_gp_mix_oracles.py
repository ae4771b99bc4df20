"""GP-mix oracles: MAP hyper-fit and HMC over GP hyperparameters (parity:
reference fast_gp_mix.py:156-268)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.evals.gp_mix_oracles import (
    gp_hyper_mcmc_predictive,
    gp_map_evaluate,
    gp_map_fit,
    gp_marginal_log_likelihood,
    log_hyperprior,
)
from pfn_tpu.ops.gp_sample import gp_sample_paths, matern52_kernel
from pfn_tpu.priors.gp_mix import GPMixPrior


@pytest.fixture(scope="module")
def dataset():
    """One GP draw with KNOWN hypers the oracles should roughly recover."""
    key = jax.random.PRNGKey(0)
    k_x, k_y = jax.random.split(key)
    x = jax.random.uniform(k_x, (1, 40, 1))
    y = gp_sample_paths(
        k_y, x, lengthscale=0.3, outputscale=1.0, noise=0.01,
        kernel=matern52_kernel,
    )
    return x[0], y[0]


def test_mll_masked_equals_submatrix(dataset):
    x, y = dataset
    t = 17
    mask = jnp.arange(x.shape[0]) < t
    full = gp_marginal_log_likelihood(
        x[:t], y[:t], 0.05, jnp.asarray([0.4]), 1.2
    )
    masked = gp_marginal_log_likelihood(
        x, y, 0.05, jnp.asarray([0.4]), 1.2, context_mask=mask
    )
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-4)


def test_hyperprior_finite_and_peaked():
    prior = GPMixPrior(num_features=1)
    lp_mid = log_hyperprior(
        {"noise": jnp.asarray(0.02), "lengthscale": jnp.asarray([0.5]),
         "outputscale": jnp.asarray(1.0)}, prior)
    lp_far = log_hyperprior(
        {"noise": jnp.asarray(50.0), "lengthscale": jnp.asarray([50.0]),
         "outputscale": jnp.asarray(50.0)}, prior)
    assert float(lp_mid) > float(lp_far)


def test_map_fit_recovers_hypers(dataset):
    x, y = dataset
    prior = GPMixPrior(num_features=1)
    hp = jax.jit(lambda: gp_map_fit(x, y, prior, steps=250, lr=0.05))()
    # Generated with ls=0.3, os=1.0, noise=0.01; MAP should land in range.
    assert 0.1 < float(hp["lengthscale"][0]) < 1.0, hp
    assert float(hp["noise"]) < 0.2, hp
    assert 0.2 < float(hp["outputscale"]) < 5.0, hp


def test_map_evaluate_sweep_improves_with_context(dataset):
    x, y = dataset
    prior = GPMixPrior(num_features=1)
    positions = jnp.asarray([3, 10, 30])
    all_losses, mean_losses = gp_map_evaluate(
        x[None], y[None], prior, positions=positions, steps=80,
    )
    assert all_losses.shape == (3, 1)
    assert bool(jnp.all(jnp.isfinite(mean_losses)))
    # More context -> no worse NLL (soft check: last <= first + margin).
    assert float(mean_losses[-1]) <= float(mean_losses[0]) + 0.5


def test_hyper_mcmc_predictive_beats_bad_hypers(dataset):
    x, y = dataset
    prior = GPMixPrior(num_features=1)
    t = 30
    mask = jnp.arange(x.shape[0]) < t
    nll, accept = gp_hyper_mcmc_predictive(
        x, y, x, y, prior, jax.random.PRNGKey(1),
        num_samples=48, num_warmup=96, context_mask=mask,
    )
    assert 0.05 < float(accept) <= 1.0
    query_nll = float(nll[t:].mean())
    assert np.isfinite(query_nll)

    # Compare against a fixed WRONG-hyper GP predictive.
    from pfn_tpu.ops.gp_sample import gp_posterior
    import math

    mean, var = gp_posterior(
        x, y, x, lengthscale=5.0, outputscale=0.01, noise=1.0,
        kernel=matern52_kernel, context_mask=mask,
    )
    bad = 0.5 * (math.log(2 * math.pi) + jnp.log(var) + (y - mean) ** 2 / var)
    assert query_nll < float(bad[t:].mean())

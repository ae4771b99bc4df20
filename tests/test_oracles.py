"""Closed-form oracle tests (SURVEY.md §4 item 2: oracles are the ground
truth; here the oracles themselves are validated against analytic results
and sklearn)."""

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.evals.oracles import (
    bayes_linreg_posterior,
    gp_exact_evaluate,
    ridge_evaluate,
)
from pfn_tpu.ops.gp_sample import gp_posterior
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.priors.ridge import RidgePrior


def test_gp_posterior_single_point_analytic():
    # One observation at x0; posterior at x0 must shrink toward y0 with
    # var = noise + outputscale*noise/(outputscale+noise) (standard result).
    os_, nz = 1.0, 0.1
    x = jnp.array([[0.5]])
    y = jnp.array([2.0])
    mean, var = gp_posterior(x, y, x, lengthscale=1.0, outputscale=os_, noise=nz)
    k = os_  # k(x0,x0)
    expected_mean = k / (k + nz) * 2.0
    expected_var = k - k * k / (k + nz) + nz
    assert abs(float(mean[0]) - expected_mean) < 1e-4
    assert abs(float(var[0]) - expected_var) < 1e-4


def test_gp_posterior_context_mask_equals_subset():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (6, 2))
    y = jax.random.normal(jax.random.PRNGKey(1), (6,))
    xq = jax.random.uniform(jax.random.PRNGKey(2), (3, 2))
    hp = dict(lengthscale=0.5, outputscale=1.2, noise=0.05)
    m_full, v_full = gp_posterior(x[:4], y[:4], xq, **hp)
    mask = jnp.arange(6) < 4
    m_masked, v_masked = gp_posterior(x, y, xq, context_mask=mask, **hp)
    np.testing.assert_allclose(np.asarray(m_full), np.asarray(m_masked), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_full), np.asarray(v_masked), atol=1e-4)


def test_gp_exact_evaluate_decreasing_nll():
    hp = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
    prior = GPPrior(num_features=1, **hp)
    x, y, _ = prior.sample(jax.random.PRNGKey(0), 256, 30)
    all_losses, mean_losses, _ = gp_exact_evaluate(x, y, hp)
    assert all_losses.shape == (29, 256)
    assert mean_losses.shape == (30,)
    # More context -> better posterior: NLL at t=25 well below t=1.
    assert float(mean_losses[25]) < float(mean_losses[1]) - 0.3


def test_ridge_evaluate_matches_sklearn():
    from sklearn.linear_model import Ridge

    prior = RidgePrior(num_features=3, noisy_std=0.05)
    x, y, yc = prior.sample(jax.random.PRNGKey(1), 16, 12)
    losses, _ = ridge_evaluate(x, y, yc, alpha=0.5)

    xn, yn, ycn = np.asarray(x), np.asarray(y), np.asarray(yc)
    for t in [1, 4, 11]:
        ref = []
        for b in range(16):
            clf = Ridge(alpha=0.5)
            clf.fit(xn[b, :t], yn[b, :t])
            pred = clf.predict(xn[b, t : t + 1])[0]
            ref.append((pred - ycn[b, t]) ** 2)
        assert abs(float(losses[t]) - np.mean(ref)) < 1e-4


def test_bayes_linreg_posterior_shrinks():
    prior = RidgePrior(num_features=2, noisy_std=0.1)
    x, y, yc = prior.sample(jax.random.PRNGKey(2), 1, 50)
    xb, yb = x[0], y[0]
    mean_few, var_few = bayes_linreg_posterior(
        xb[:2], yb[:2], xb[-1:], weight_std=0.1, noise_std=0.1
    )
    mean_many, var_many = bayes_linreg_posterior(
        xb[:45], yb[:45], xb[-1:], weight_std=0.1, noise_std=0.1
    )
    assert float(var_many[0]) < float(var_few[0])
    # With lots of data the predictive mean approaches the noise-free value.
    assert abs(float(mean_many[0]) - float(yc[0, -1])) < 0.2


def test_bayes_linreg_calibration():
    # Average NLL of the exact posterior should be near the entropy of the
    # predictive; sanity-check that z-scores are standard normal.
    prior = RidgePrior(num_features=2, noisy_std=0.1)
    x, y, yc = prior.sample(jax.random.PRNGKey(3), 512, 21)
    mean, var = jax.vmap(
        lambda xb, yb: bayes_linreg_posterior(
            xb[:20], yb[:20], xb[20:], weight_std=0.1, noise_std=0.1
        )
    )(x, y)
    z = (np.asarray(y[:, 20]) - np.asarray(mean[:, 0])) / np.sqrt(
        np.asarray(var[:, 0])
    )
    assert abs(z.mean()) < 0.1
    assert abs(z.std() - 1.0) < 0.1


def test_f64_oracle_reaches_noise_floor_large_context():
    """The exact-GP oracle must approach the noise NLL floor at large
    context; the f32 path needs ~1e-3 Cholesky jitter at large T which
    inflates the predictive variance ~10x (the Fig-3a oracle bug), so the
    f64 path exists and must be accurate. Runs in a subprocess because
    jax_enable_x64 is process-global."""
    import subprocess
    import sys

    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import math
from pfn_tpu.evals import gp_exact_evaluate
from pfn_tpu.ops.gp_sample import gp_sample_paths

hp = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
key = jax.random.PRNGKey(0)
x = jnp.linspace(0, 1, 512)[None, :, None].astype(jnp.float64)
x = jnp.tile(x, (4, 1, 1))
y = gp_sample_paths(key, x.astype(jnp.float32), **hp).astype(jnp.float64)
_, nll, _ = gp_exact_evaluate(x, y, hp, positions=jnp.asarray([500]), dtype=jnp.float64)
floor = 0.5 * (math.log(2 * math.pi) + math.log(hp["noise"]))
print("ORACLE", float(nll[0]), "FLOOR", floor)
assert abs(float(nll[0]) - floor) < 0.7, (float(nll[0]), floor)
print("OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600,
    )
    assert "OK" in out.stdout, (out.stdout, out.stderr[-2000:])

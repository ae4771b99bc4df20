"""Independent-library cross-checks of the JAX oracles.

Parity: the reference keeps a slow sklearn GP path purely as a correctness
cross-check of its fast gpytorch path (priors/gp.py, SURVEY.md §2 row 10).
Here sklearn validates the fused jnp GP posterior and the ridge oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfn_tpu.ops.gp_sample import gp_posterior


def test_gp_posterior_matches_sklearn():
    sklearn_gp = pytest.importorskip("sklearn.gaussian_process")
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, ConstantKernel

    rng = np.random.RandomState(0)
    X = rng.rand(12, 1).astype(np.float64)
    y = np.sin(X[:, 0] * 5).astype(np.float64)
    Xq = np.linspace(0, 1, 9)[:, None]

    ls, os_, noise = 0.3, 1.7, 1e-2
    gpr = GaussianProcessRegressor(
        kernel=ConstantKernel(os_, "fixed") * RBF(ls, "fixed"),
        alpha=noise,  # sklearn's alpha = likelihood noise variance
        optimizer=None,
    ).fit(X, y)
    mean_sk, std_sk = gpr.predict(Xq, return_std=True)

    mean_j, var_j = gp_posterior(
        jnp.asarray(X, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(Xq, jnp.float32),
        lengthscale=ls, outputscale=os_, noise=noise,
    )
    np.testing.assert_allclose(np.asarray(mean_j), mean_sk, atol=2e-3)
    # sklearn's return_std excludes observation noise; ours includes it.
    np.testing.assert_allclose(
        np.sqrt(np.maximum(np.asarray(var_j) - noise, 0.0)), std_sk, atol=2e-3
    )


def test_ridge_evaluate_matches_sklearn_refit():
    sklearn_lm = pytest.importorskip("sklearn.linear_model")
    from sklearn.linear_model import Ridge

    from pfn_tpu.evals import ridge_evaluate

    rng = np.random.RandomState(1)
    B, T, F = 3, 10, 2
    x = rng.rand(B, T, F).astype(np.float32)
    w = 0.3 * rng.randn(B, F).astype(np.float32)
    y_clean = np.einsum("bf,btf->bt", w, x)
    y = y_clean + 0.05 * rng.randn(B, T).astype(np.float32)

    alpha = 0.5
    losses, _ = ridge_evaluate(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(y_clean), alpha=alpha
    )

    # Reference protocol (priors/ridge.py:22-34): refit per context size t,
    # score the prediction at row t against the noise-free target.
    for t in [2, 5, 9]:
        mses = []
        for b in range(B):
            m = Ridge(alpha=alpha).fit(x[b, :t], y[b, :t])
            mses.append((m.predict(x[b, t : t + 1])[0] - y_clean[b, t]) ** 2)
        np.testing.assert_allclose(float(losses[t]), np.mean(mses), atol=1e-4)

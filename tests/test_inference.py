"""SVI / HMC / SVGD oracle correctness on conjugate problems."""

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.evals.inference import hmc, svgd, svi


def gaussian_posterior_problem():
    # Prior mu ~ N(0, 1); data y_i ~ N(mu, sigma2=0.5^2), n=20 obs at 1.0.
    n, sigma2 = 20, 0.25
    y = jnp.full((n,), 1.0)
    post_var = 1.0 / (1.0 + n / sigma2)
    post_mean = post_var * (jnp.sum(y) / sigma2)

    def log_joint(theta):
        mu = theta["mu"]
        lp = -0.5 * mu**2
        ll = -0.5 * jnp.sum((y - mu) ** 2) / sigma2
        return (lp + ll).sum()

    return log_joint, float(post_mean), float(post_var)


def test_svi_recovers_conjugate_gaussian():
    log_joint, post_mean, post_var = gaussian_posterior_problem()
    res = svi(
        log_joint, {"mu": jnp.zeros(())}, jax.random.PRNGKey(0),
        num_steps=3000, lr=2e-2, num_particles=8,
    )
    assert abs(float(res.mu["mu"]) - post_mean) < 0.05
    assert abs(float(jnp.exp(res.log_sigma["mu"]) ** 2) - post_var) < 0.02
    # ELBO improved.
    assert float(res.losses[-50:].mean()) < float(res.losses[:50].mean())


def test_svi_sampling_shapes():
    log_joint, _, _ = gaussian_posterior_problem()
    res = svi(log_joint, {"mu": jnp.zeros(())}, jax.random.PRNGKey(0), num_steps=100)
    s = res.sample(jax.random.PRNGKey(1), 64)
    assert s["mu"].shape == (64,)


def test_hmc_recovers_conjugate_gaussian():
    log_joint, post_mean, post_var = gaussian_posterior_problem()
    samples, accept = hmc(
        log_joint, {"mu": jnp.zeros(())}, jax.random.PRNGKey(0),
        num_samples=1500, num_warmup=500, num_leapfrog=10,
    )
    mu = np.asarray(samples["mu"])
    assert 0.4 < float(accept) < 1.0
    assert abs(mu.mean() - post_mean) < 0.05
    assert abs(mu.var() - post_var) < 0.03


def test_hmc_correlated_gaussian():
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)

    def log_prob(theta):
        x = theta["x"]
        return -0.5 * x @ prec @ x

    samples, accept = hmc(
        log_prob, {"x": jnp.zeros(2)}, jax.random.PRNGKey(1),
        num_samples=3000, num_warmup=500, num_leapfrog=15,
    )
    xs = np.asarray(samples["x"])
    emp_cov = np.cov(xs.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.25)


def test_svgd_gaussian_moments():
    def log_prob(x):
        return -0.5 * jnp.sum((x - 2.0) ** 2)

    init = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    particles = svgd(log_prob, init, jax.random.PRNGKey(1), num_steps=1500, lr=0.3)
    p = np.asarray(particles)
    np.testing.assert_allclose(p.mean(axis=0), 2.0, atol=0.3)
    # The repulsion term must keep posterior spread ~1 (a sign error in the
    # kernel-gradient sum collapses particles to std ~0.2).
    np.testing.assert_allclose(p.std(axis=0), 1.0, atol=0.35)


def test_bnn_classifier_learns_separable_data():
    from pfn_tpu.evals.tabular import BayesianNNClassifier

    rng = np.random.RandomState(0)
    X = rng.randn(80, 2).astype(np.float32)
    y = (X[:, 0] + X[:, 1] > 0).astype(np.int32)
    clf = BayesianNNClassifier(num_features=2, embed=8, num_steps=600, lr=1e-2)
    clf.fit(X[:60], y[:60])
    probs = clf.predict_proba(X[60:])
    from sklearn.metrics import roc_auc_score

    assert roc_auc_score(y[60:], probs) > 0.9

"""Prior sampler statistical tests: the on-device generators must produce
data with the distributional properties the reference's torch/gpytorch
samplers have (SURVEY.md §4 item a/b)."""

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.ops.gp_sample import rbf_kernel, matern52_kernel
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.priors.gp_mix import GPMixPrior
from pfn_tpu.priors.mlp import MLPPrior
from pfn_tpu.priors.module import ModulePrior
from pfn_tpu.priors.binarize import binarized_gp_prior
from pfn_tpu.priors.ridge import RidgePrior


def test_ridge_shapes_and_stats():
    prior = RidgePrior(num_features=3, noisy_std=0.01)
    x, y, yc = prior.sample(jax.random.PRNGKey(0), 512, 20)
    assert x.shape == (512, 20, 3) and y.shape == (512, 20) and yc.shape == (512, 20)
    # y ~ w.x with w ~ N(0, .1^2), x ~ U(0,1): E[y] = 0.
    assert abs(float(y.mean())) < 0.01
    # Noise std matches.
    assert abs(float((y - yc).std()) - 0.01) < 0.002


def test_gp_marginal_variance_and_kernel():
    hp = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
    prior = GPPrior(num_features=1, **hp)
    x, y, _ = prior.sample(jax.random.PRNGKey(1), 4096, 16)
    # Marginal variance = outputscale + noise.
    assert abs(float((y**2).mean()) - 1.0001) < 0.05
    # Empirical covariance of two nearby points matches the RBF kernel.
    prior_eq = GPPrior(num_features=1, equidistant_x=True, **hp)
    x, y, _ = prior_eq.sample(jax.random.PRNGKey(2), 8192, 8)
    emp_cov = float((y[:, 0] * y[:, 1]).mean())
    d = float(x[0, 1, 0] - x[0, 0, 0])
    expected = float(np.exp(-0.5 * d**2 / 0.6**2))
    assert abs(emp_cov - expected) < 0.05


def test_gp_default_hyperparameters_match_reference():
    # Defaults are {noise: .1, outputscale: .1, lengthscale: .1}
    # (reference priors/fast_gp.py:40).
    p = GPPrior()
    assert (p.noise, p.outputscale, p.lengthscale) == (0.1, 0.1, 0.1)
    _, y, _ = p.sample(jax.random.PRNGKey(3), 4096, 8)
    assert abs(float((y**2).mean()) - 0.2) < 0.02


def test_kernels_basic_properties():
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 2))
    for kern in (rbf_kernel, matern52_kernel):
        K = kern(x, x, lengthscale=0.7, outputscale=2.0)
        np.testing.assert_allclose(np.diag(np.asarray(K)), 2.0, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K).T, atol=1e-5)
        evals = np.linalg.eigvalsh(np.asarray(K))
        assert evals.min() > -1e-4


def test_gp_mix_group_sharing_and_range():
    prior = GPMixPrior(num_features=2, batch_size_per_gp_sample=8)
    noise, ls, os_ = prior.sample_hypers(jax.random.PRNGKey(0), 32)
    assert noise.shape == (32,) and ls.shape == (32, 2) and os_.shape == (32,)
    # Hypers shared within groups of 8.
    assert float(jnp.abs(noise[:8] - noise[0]).max()) == 0.0
    assert float(jnp.abs(noise[8] - noise[0])) > 0.0

    x, y, _ = prior.sample(jax.random.PRNGKey(1), 32, 10)
    assert x.shape == (32, 10, 2) and y.shape == (32, 10)
    assert np.isfinite(np.asarray(y)).all()


def test_gp_mix_fix_to_range():
    prior = GPMixPrior(
        num_features=1, batch_size_per_gp_sample=4, fix_to_range=(-2.0, 2.0)
    )
    _, y, _ = prior.sample(jax.random.PRNGKey(2), 16, 12)
    assert float(y.min()) >= -2.0 and float(y.max()) < 2.0


def test_gp_mix_sigmoid_and_minmax():
    for kwargs in (dict(sigmoid=True), dict(y_minmax_norm=True)):
        prior = GPMixPrior(num_features=1, batch_size_per_gp_sample=4, **kwargs)
        _, y, _ = prior.sample(jax.random.PRNGKey(3), 8, 10)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_mlp_prior_shapes_and_normalization():
    prior = MLPPrior(num_features=4, batch_size_per_sample=4, max_layers=5)
    x, y, _ = prior.sample(jax.random.PRNGKey(0), 16, 32)
    assert x.shape == (16, 32, 4) and y.shape == (16, 32)
    # z-scored per dataset over the sequence axis.
    np.testing.assert_allclose(np.asarray(y.mean(axis=1)), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(y.std(axis=1)), 1.0, atol=0.05)


def test_mlp_prior_binary_classification():
    prior = MLPPrior(
        num_features=2, batch_size_per_sample=4, is_binary_classification=True
    )
    _, y, _ = prior.sample(jax.random.PRNGKey(1), 8, 20)
    vals = np.unique(np.asarray(y))
    assert set(vals).issubset({0.0, 1.0})


def test_mlp_prior_causal_mode():
    prior = MLPPrior(
        num_features=3, batch_size_per_sample=4, is_causal=True, max_hidden=32
    )
    x, y, _ = prior.sample(jax.random.PRNGKey(2), 8, 16)
    assert x.shape == (8, 16, 3)
    assert np.isfinite(np.asarray(x)).all() and np.isfinite(np.asarray(y)).all()


def test_module_prior_custom_sampler():
    # Bring-your-own-prior: a linear model with a per-model sampled slope.
    def sample_fn(model_key, data_key, seq_len):
        slope = jax.random.normal(model_key, ())
        x = jax.random.uniform(data_key, (seq_len, 1))
        return x, slope * x[:, 0]

    prior = ModulePrior(sample_fn=sample_fn, num_features=1, batch_size_per_model=4)
    x, y, _ = prior.sample(jax.random.PRNGKey(0), 8, 10)
    assert x.shape == (8, 10, 1) and y.shape == (8, 10)


def test_binarized_prior_labels():
    prior = binarized_gp_prior(num_features=1)
    assert prior.num_outputs == 2
    _, y, _ = prior.sample(jax.random.PRNGKey(0), 32, 10)
    assert set(np.unique(np.asarray(y))).issubset({0.0, 1.0})


def test_prior_sampling_is_jittable_and_deterministic():
    prior = GPPrior(num_features=2)
    f = jax.jit(lambda k: prior.sample(k, 8, 10))
    x1, y1, _ = f(jax.random.PRNGKey(7))
    x2, y2, _ = f(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_psd_safe_cholesky_rank_deficient():
    """Near-singular kernel matrices must factor via the jitter ladder —
    a plain f32 Cholesky of a T>=512 RBF kernel with tiny noise returns NaN
    (the bptt=2010 Fig-3a regime)."""
    import jax
    import jax.numpy as jnp

    from pfn_tpu.ops.gp_sample import psd_safe_cholesky, rbf_kernel

    x = jnp.linspace(0, 1, 512)[:, None]
    K = rbf_kernel(x, x, lengthscale=0.6, outputscale=1.0)
    A = K + 1e-4 * jnp.eye(512)
    plain = jax.lax.linalg.cholesky(A)
    safe = psd_safe_cholesky(A)
    assert bool(jnp.all(jnp.isfinite(safe)))
    # The ladder only engages when needed; on well-conditioned input it is
    # the plain factorization.
    B = jnp.eye(8) * 2.0
    np.testing.assert_allclose(
        np.asarray(psd_safe_cholesky(B, initial_jitter=0.0)),
        np.asarray(jnp.linalg.cholesky(B)), atol=1e-6,
    )


def test_gp_prior_long_sequence_finite():
    """GP sampling stays finite at bptt=2010 (needs the PSD-safe ladder)."""
    import jax
    import jax.numpy as jnp

    from pfn_tpu.priors.gp import GPPrior

    prior = GPPrior(num_features=1, noise=1e-4, outputscale=1.0, lengthscale=0.6)
    _, y, _ = jax.jit(lambda k: prior.sample(k, 2, 1024))(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(y)))


def test_mlp_prior_categorical_discretization_semantics():
    """Direct semantics of the discretizer (reference mlp.py:160-170): each
    column is either untouched or replaced by integer bin ids in range."""
    prior = MLPPrior(num_features=6, categorical_x=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 50, 6))
    n_used = jnp.asarray(6, jnp.int32)
    changed_any = False
    for seed in range(6):
        out = prior._discretize_categoricals(
            jax.random.PRNGKey(seed), x, n_used
        )
        out_np, x_np = np.asarray(out), np.asarray(x)
        for f in range(6):
            col = out_np[:, :, f]
            if np.array_equal(col, x_np[:, :, f]):
                continue  # not selected as categorical
            changed_any = True
            # Bin ids: integers within [0, max ordinal classes].
            np.testing.assert_array_equal(col, np.round(col))
            assert col.min() >= 0 and col.max() <= 200
    assert changed_any, "no feature was discretized across 6 seeds"


def test_mlp_prior_categorical_discrete_marginals():
    """End to end: with categorical_x on, some feature columns carry few
    distinct values per dataset (discrete marginals); without it, every
    column is continuous (T distinct values)."""
    kwargs = dict(num_features=8, batch_size_per_sample=4)
    T = 64
    x_cat, _, _ = MLPPrior(categorical_x=True, **kwargs).sample(
        jax.random.PRNGKey(5), 32, T
    )
    x_cont, _, _ = MLPPrior(**kwargs).sample(jax.random.PRNGKey(5), 32, T)
    assert np.isfinite(np.asarray(x_cat)).all()

    def min_distinct(x):
        x = np.asarray(x)
        return min(
            len(np.unique(x[b, :, f]))
            for b in range(x.shape[0])
            for f in range(x.shape[2])
        )

    assert min_distinct(x_cont) == T  # continuous: all values distinct
    # Discretized-then-z-scored columns have at most n_classes+1 levels; with
    # 8 groups x 8 features some column is near-surely coarse.
    assert min_distinct(x_cat) <= 12


def test_gp_grid_fast_path_matches_kernel_statistics():
    """The grid sampler draws y with the SAME joint distribution as the
    direct Cholesky path: empirical Cov[y] over many datasets at the
    sampled x locations must match K(x, x') + noise*I."""
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.ops.gp_sample import rbf_kernel

    hp = dict(noise=0.01, outputscale=1.0, lengthscale=0.4)
    prior = GPPrior(num_features=1, grid=512, **hp)
    B, T = 4096, 6
    x, y, ty = jax.jit(lambda k: prior.sample(k, B, T))(jax.random.PRNGKey(0))
    assert x.shape == (B, T, 1) and y.shape == (B, T)
    assert (ty == y).all()
    x_np, y_np = np.asarray(x), np.asarray(y)
    assert x_np.min() >= 0.0 and x_np.max() <= 1.0

    # Group datasets by nothing — each dataset has its own x, so compare
    # per-dataset quadratic forms: E[y_i y_j] == K_ij averaged over datasets
    # normalized by the analytic value. Use the analytic kernel per dataset.
    K = np.asarray(
        rbf_kernel(x, x, hp["lengthscale"], hp["outputscale"])
    ) + hp["noise"] * np.eye(T)
    emp = y_np[:, :, None] * y_np[:, None, :]  # per-dataset outer product
    # E over B of emp[b] - K[b] should vanish ~ O(1/sqrt(B)).
    resid = (emp - K).mean(axis=0)
    assert np.abs(resid).max() < 0.08, np.abs(resid).max()

    # Determinism + jit stability.
    x2, y2, _ = jax.jit(lambda k: prior.sample(k, B, T))(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(y2), y_np)


def test_gp_grid_repeated_x_share_latent():
    """Grid collisions are exact GP semantics: identical x within a dataset
    differ only by observation noise."""
    from pfn_tpu.priors.gp import GPPrior

    prior = GPPrior(num_features=1, grid=4, noise=1e-8, outputscale=1.0,
                    lengthscale=0.5)
    x, y, _ = prior.sample(jax.random.PRNGKey(1), 64, 32)
    x_np, y_np = np.asarray(x)[..., 0], np.asarray(y)
    found = 0
    for b in range(64):
        for t1 in range(32):
            dup = np.where(x_np[b] == x_np[b, t1])[0]
            for t2 in dup[dup > t1]:
                found += 1
                assert abs(y_np[b, t1] - y_np[b, t2]) < 1e-3
    assert found > 10  # grid=4 over 32 points guarantees many collisions

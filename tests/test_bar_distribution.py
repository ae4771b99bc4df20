"""Bar-distribution unit tests: bucket-mapping edges, NLL vs hand-computed
densities, posterior summaries, half-normal tails (SURVEY.md §4 item c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.distributions import (
    BarDistribution,
    FullSupportBarDistribution,
    get_bucket_limits,
)


@pytest.fixture
def bd():
    return BarDistribution.create(jnp.array([0.0, 1.0, 3.0, 6.0]))


def test_bucket_mapping_edges(bd):
    y = jnp.array([0.0, 0.5, 1.0, 1.5, 3.0, 5.9, 6.0])
    idx = bd.map_to_bucket_idx(y)
    # Border values fall in the lower bucket; endpoints clamp to end buckets
    # (reference bar_distribution.py:19-23 semantics).
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0, 1, 1, 2, 2])


def test_nll_matches_hand_computed_density(bd):
    logits = jnp.log(jnp.array([0.2, 0.3, 0.5]))
    # Bucket widths 1, 2, 3 -> densities 0.2/1, 0.3/2, 0.5/3.
    y = jnp.array([0.5, 2.0, 4.0])
    expected = -np.log([0.2 / 1.0, 0.3 / 2.0, 0.5 / 3.0])
    got = bd.nll(jnp.broadcast_to(logits, (3, 3)), y)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_density_integrates_to_one(bd):
    logits = jnp.array([0.3, -1.2, 0.7])
    ys = jnp.linspace(0.001, 5.999, 20000)
    dens = jnp.exp(-bd.nll(jnp.broadcast_to(logits, (20000, 3)), ys))
    integral = jnp.trapezoid(dens, ys)
    assert abs(float(integral) - 1.0) < 1e-3


def test_mean_mode(bd):
    # All mass in bucket 1 -> mean = mode = bucket center 2.0.
    logits = jnp.array([-100.0, 100.0, -100.0])
    assert abs(float(bd.mean(logits)) - 2.0) < 1e-4
    assert abs(float(bd.mode(logits)) - 2.0) < 1e-4


def test_cdf_icdf_roundtrip(bd):
    logits = jnp.array([0.5, 1.0, -0.3])
    for q in [0.1, 0.25, 0.5, 0.9]:
        y = bd.icdf(logits, q)
        c = bd.cdf(logits, y)
        assert abs(float(c) - q) < 1e-4


def test_quantile_interval(bd):
    logits = jnp.array([0.0, 0.0, 0.0])
    lo_hi = bd.quantile(logits, center_prob=0.5)
    lo, hi = float(lo_hi[0]), float(lo_hi[1])
    assert abs(bd.cdf(logits, lo) - 0.25) < 1e-4
    assert abs(bd.cdf(logits, hi) - 0.75) < 1e-4
    assert lo < hi


def test_ei_maximize(bd):
    # Uniform probabilities; best_f = 3.0 -> only bucket 2 ([3, 6]) improves,
    # with truncated-bucket mean (6 + max(3, 3))/2 - 3 = 1.5, weight 1/3.
    logits = jnp.zeros(3)
    ei = float(bd.ei(logits, best_f=3.0, maximize=True))
    assert abs(ei - 1.5 / 3.0) < 1e-5


def test_full_support_nll_tails():
    fb = FullSupportBarDistribution.create(jnp.array([0.0, 1.0, 3.0, 6.0]))
    logits = jnp.zeros(3)
    # Outside-the-support samples get finite NLL through half-normal tails.
    for y in [-5.0, -0.1, 7.0, 100.0]:
        v = float(fb.nll(logits, jnp.asarray(y)))
        assert np.isfinite(v)
    # Tail NLL grows as we go further out.
    assert float(fb.nll(logits, jnp.asarray(-10.0))) > float(
        fb.nll(logits, jnp.asarray(-1.0))
    )


def test_full_support_density_integrates_to_one():
    fb = FullSupportBarDistribution.create(jnp.array([-1.0, 0.0, 1.0, 2.0]))
    logits = jnp.array([0.4, -0.6, 1.1])
    ys = jnp.linspace(-30.0, 30.0, 300001)
    dens = jnp.exp(-fb.nll(jnp.broadcast_to(logits, (ys.shape[0], 3)), ys))
    integral = float(jnp.trapezoid(dens, ys))
    assert abs(integral - 1.0) < 2e-3


def test_full_support_mean_tail_adjustment():
    fb = FullSupportBarDistribution.create(jnp.array([0.0, 1.0, 2.0, 3.0]))
    # All mass on the last (tail) bucket: mean = borders[-2] + halfnormal mean.
    logits = jnp.array([-100.0, -100.0, 100.0])
    m = float(fb.mean(logits))
    import math

    scale = 1.0 / (math.sqrt(2) * 0.47693627620446987)
    expected = 2.0 + scale * math.sqrt(2 / math.pi)
    assert abs(m - expected) < 1e-4


def test_get_bucket_limits_range():
    borders = np.asarray(get_bucket_limits(4, full_range=(0.0, 8.0)))
    np.testing.assert_allclose(borders, [0.0, 2.0, 4.0, 6.0, 8.0])


def test_get_bucket_limits_equal_mass():
    ys = np.random.RandomState(0).normal(size=10000)
    borders = np.asarray(get_bucket_limits(10, ys=ys))
    bd = BarDistribution.create(borders)
    idx = np.asarray(bd.map_to_bucket_idx(jnp.asarray(ys)))
    counts = np.bincount(idx, minlength=10)
    assert counts.min() >= 900 and counts.max() <= 1100


def test_sampling_matches_distribution(bd):
    logits = jnp.array([1.0, 0.0, -1.0])
    samples = bd.sample(jax.random.PRNGKey(0), jnp.broadcast_to(logits, (50000, 3)))
    p = np.asarray(jax.nn.softmax(logits))
    idx = np.asarray(bd.map_to_bucket_idx(samples))
    freq = np.bincount(idx, minlength=3) / 50000
    np.testing.assert_allclose(freq, p, atol=0.01)


class TestGaussianCrossEntropy:
    """Closed-form E_{y~N}[nll] (the Rao-Blackwellized Fig-3a gap) must match
    Monte Carlo through the actual nll() under every mass regime."""

    def _dist(self):
        from pfn_tpu.distributions import (
            FullSupportBarDistribution,
            get_bucket_limits,
        )

        ys = np.tanh(np.linspace(-2.5, 2.5, 4000)) * 2.0  # uneven widths
        borders = get_bucket_limits(64, ys=ys)
        return FullSupportBarDistribution.create(borders)

    def test_matches_monte_carlo(self):
        # The formula is also quadrature-verified to ~1e-9 relative (incl.
        # tail-dominated cases at CE ~ 5000 nats); this MC check exercises
        # consistency with the actual nll() implementation.
        d = self._dist()
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(key, (d.num_bars,)) * 2.0
        # Interior / near-left-tail / deep-right-tail / narrow-sigma cases.
        # (Narrow sigma can straddle a bucket border: per-sample nll is then
        # bimodal with std ~ the lp gap, so se must come from the sample.)
        cases = [(0.3, 0.5), (-1.9, 0.7), (2.6, 0.4), (0.11, 0.02)]
        for i, (mu, sigma) in enumerate(cases):
            ys = mu + sigma * jax.random.normal(
                jax.random.PRNGKey(10 + i), (400_000,)
            )
            vals = d.nll(logits[None, :], ys)
            mc = float(vals.mean())
            se = float(vals.std()) / np.sqrt(vals.size)
            ce = float(d.gaussian_cross_entropy(logits, mu, sigma**2))
            assert abs(ce - mc) < 6 * se + 5e-3, (
                f"case {i}: analytic {ce:.5f} vs MC {mc:.5f} (se {se:.5f})"
            )

    def test_kl_nonnegative_and_zero_floor(self):
        d = self._dist()
        # KL >= 0 for arbitrary logits against arbitrary Gaussians.
        for i in range(5):
            logits = jax.random.normal(jax.random.PRNGKey(i), (3, d.num_bars))
            kl = d.gaussian_kl(logits, jnp.asarray([0.0, -1.5, 2.2]),
                               jnp.asarray([0.3, 0.05, 1.0]))
            assert (np.asarray(kl) > -1e-4).all()
        # A bar head whose bucket masses match the Gaussian has small KL —
        # only the within-bucket piecewise-constant mismatch remains. The
        # borders must come from a Gaussian-like sample so the END buckets
        # are wide: narrow end buckets mean narrow half-normal tails that
        # cannot cover a Gaussian extending past the support (a genuine
        # property of the FullSupport head, worth ~1 nat with tanh borders).
        gs = np.random.default_rng(0).normal(0.2, 0.6, 64_000)
        from pfn_tpu.distributions import (
            FullSupportBarDistribution,
            get_bucket_limits,
        )

        d2 = FullSupportBarDistribution.create(get_bucket_limits(64, ys=gs))
        mu, sigma = 0.2, 0.6
        z = (np.asarray(d2.borders) - mu) / sigma
        masses = np.diff(
            0.5 * (1 + jax.scipy.special.erf(jnp.asarray(z) / np.sqrt(2)))
        )
        logits = jnp.log(jnp.clip(jnp.asarray(masses), 1e-12))
        kl = float(d2.gaussian_kl(logits, mu, sigma**2))
        assert 0.0 <= kl < 0.08, kl

    def test_moments_oracle_consistent_with_nll_oracle(self):
        """gp_exact_posterior_moments must be the same Gaussian the NLL
        oracle scores: gaussian_nll(y_t; mean, var) == gp_exact_evaluate."""
        from pfn_tpu.evals import gp_exact_evaluate, gp_exact_posterior_moments
        from pfn_tpu.priors.gp import GPPrior

        hp = dict(noise=1e-2, outputscale=1.0, lengthscale=0.6)
        prior = GPPrior(num_features=1, **hp)
        x, y, _ = prior.sample(jax.random.PRNGKey(3), 4, 24)
        positions = jnp.asarray([1, 5, 10, 20])
        nll, _, _ = gp_exact_evaluate(x, y, hp, positions=positions)
        mean, var = gp_exact_posterior_moments(x, y, hp, positions=positions)
        picked_y = np.asarray(y)[:, np.asarray(positions)].T  # (P, B)
        ref = 0.5 * (
            np.log(2 * np.pi * np.asarray(var))
            + (picked_y - np.asarray(mean)) ** 2 / np.asarray(var)
        )
        np.testing.assert_allclose(np.asarray(nll), ref, rtol=1e-4, atol=1e-5)

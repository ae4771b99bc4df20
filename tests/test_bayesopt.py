"""BayesOpt acquisitions + PFN-BO loop (restores the intended API of the
reference's acquisition_functions.py stub; working EI semantics from
bar_distribution.py:69-80)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu import bayesopt
from pfn_tpu.distributions import BarDistribution, get_bucket_limits


@pytest.fixture(scope="module")
def bar():
    return BarDistribution.create(get_bucket_limits(50, full_range=(-2.0, 2.0)))


def test_acquisition_shapes_and_sanity(bar):
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (7, bar.num_bars))
    ei = bayesopt.expected_improvement(bar, logits, best_f=0.0)
    pi = bayesopt.probability_of_improvement(bar, logits, best_f=0.0)
    ucb = bayesopt.upper_confidence_bound(bar, logits, beta=1.0)
    ts = bayesopt.thompson_sample(bar, logits, key)
    for a in (ei, pi, ucb, ts):
        assert a.shape == (7,)
        assert bool(jnp.all(jnp.isfinite(a)))
    assert bool(jnp.all(ei >= 0))
    assert bool(jnp.all((pi >= 0) & (pi <= 1)))


def test_pi_monotone_in_best_f(bar):
    """Raising the incumbent can only lower improvement probability."""
    logits = jax.random.normal(jax.random.PRNGKey(1), (5, bar.num_bars))
    pi_lo = bayesopt.probability_of_improvement(bar, logits, best_f=-1.0)
    pi_hi = bayesopt.probability_of_improvement(bar, logits, best_f=1.0)
    assert bool(jnp.all(pi_hi <= pi_lo + 1e-6))


def test_ei_prefers_high_mean_bucket(bar):
    """A distribution massed above best_f dominates one massed below."""
    hot = jnp.full((bar.num_bars,), -30.0).at[-2].set(10.0)  # mass near +2
    cold = jnp.full((bar.num_bars,), -30.0).at[1].set(10.0)  # mass near -2
    logits = jnp.stack([cold, hot])
    ei = bayesopt.expected_improvement(bar, logits, best_f=0.0)
    assert float(ei[1]) > float(ei[0])


@pytest.fixture(scope="module")
def tiny_pfn(bar):
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, Criterion, train

    prior = GPPrior(num_features=1, noise=1e-4, outputscale=1.0, lengthscale=0.3)
    crit = Criterion(kind="bar", bar=bar)
    cfg = TrainConfig(
        emsize=32, nhid=64, nlayers=2, nhead=2, epochs=20, steps_per_epoch=24,
        batch_size=32, bptt=24, lr=3e-3, warmup_epochs=3, verbose=False,
    )
    res = train(prior, crit, cfg)
    return res.model, res.params


def test_bo_loop_beats_random_on_smooth_objective(bar, tiny_pfn):
    model, params = tiny_pfn
    opt = bayesopt.PFNOptimizer(model=model, params=params, bar=bar)

    peak = 0.73
    objective = lambda x: float(jnp.exp(-30.0 * (x[0] - peak) ** 2))
    candidates = jnp.linspace(0.0, 1.0, 33)[:, None]

    x_obs, y_obs = bayesopt.optimize(
        objective, opt, candidates, num_iterations=6, key=jax.random.PRNGKey(0),
        num_init=2,
    )
    assert x_obs.shape == (8, 1) and y_obs.shape == (8,)
    # BO must find a better point than its random initialization.
    assert float(y_obs[2:].max()) >= float(y_obs[:2].max())
    # And get near the optimum (objective max = 1).
    assert float(y_obs.max()) > 0.5


def test_scores_jit_stable_across_num_obs(bar, tiny_pfn):
    """One compilation serves every context size (num_obs is traced)."""
    model, params = tiny_pfn
    opt = bayesopt.PFNOptimizer(model=model, params=params, bar=bar)
    x_obs = jnp.zeros((6, 1))
    y_obs = jnp.zeros((6,))
    cands = jnp.linspace(0, 1, 9)[:, None]
    score_jit = jax.jit(opt.scores)
    s2 = score_jit(x_obs, y_obs, cands, num_obs=2)
    s5 = score_jit(x_obs, y_obs, cands, num_obs=5)
    assert s2.shape == s5.shape == (9,)
    assert np.isfinite(np.asarray(s2)).all() and np.isfinite(np.asarray(s5)).all()

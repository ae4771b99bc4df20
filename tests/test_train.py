"""End-to-end training tests: the fused step runs, the loss decreases, and a
small GP-prior PFN approaches the exact-GP oracle (SURVEY.md §4 item b)."""

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.distributions import get_bucket_limits
from pfn_tpu.evals.harness import eval_positional_loss, pfn_predict
from pfn_tpu.priors.base import sample_y_for_buckets
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.priors.ridge import RidgePrior
from pfn_tpu.train import (
    TrainConfig,
    bar_criterion,
    gaussian_nll_criterion,
    train,
)


def test_training_reduces_loss_ridge():
    prior = RidgePrior(num_features=1, noisy_std=0.1)
    ys = sample_y_for_buckets(prior, 2000, 20)
    crit = bar_criterion(get_bucket_limits(20, ys=ys, full_range=(-3, 3)))
    cfg = TrainConfig(
        emsize=32,
        nhid=64,
        nlayers=2,
        nhead=4,
        epochs=4,
        steps_per_epoch=8,
        batch_size=32,
        bptt=12,
        lr=3e-3,
        warmup_epochs=1,
        seed=0,
        verbose=False,
        attention_impl="dense",
    )
    result = train(prior, crit, cfg)
    first = result.epoch_stats[0]["mean_loss"]
    last = result.epoch_stats[-1]["mean_loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_training_gaussian_criterion():
    prior = RidgePrior(num_features=1, noisy_std=0.1)
    cfg = TrainConfig(
        emsize=32,
        nhid=64,
        nlayers=2,
        nhead=4,
        epochs=2,
        steps_per_epoch=4,
        batch_size=16,
        bptt=10,
        lr=1e-3,
        warmup_epochs=1,
        verbose=False,
        attention_impl="dense",
    )
    result = train(prior, gaussian_nll_criterion(), cfg)
    assert np.isfinite(result.final_loss)
    # Head width is 2 (mean, var).
    x = jnp.zeros((1, 10, 1))
    y = jnp.zeros((1, 10))
    out = result.model.apply(result.params, x, y, 5)
    assert out.shape == (1, 10, 2)


def test_gradient_accumulation_matches_step_count():
    prior = RidgePrior(num_features=1)
    cfg = TrainConfig(
        emsize=16,
        nhid=32,
        nlayers=1,
        nhead=2,
        epochs=1,
        steps_per_epoch=8,
        aggregate_k_gradients=4,
        batch_size=8,
        bptt=8,
        lr=1e-3,
        warmup_epochs=1,
        verbose=False,
        attention_impl="dense",
    )
    result = train(prior, gaussian_nll_criterion(), cfg)
    assert np.isfinite(result.final_loss)


def test_positional_loss_bookkeeping():
    prior = RidgePrior(num_features=1)
    cfg = TrainConfig(
        emsize=16,
        nhid=32,
        nlayers=1,
        nhead=2,
        epochs=1,
        steps_per_epoch=16,
        batch_size=8,
        bptt=8,
        lr=1e-3,
        warmup_epochs=1,
        verbose=False,
        attention_impl="dense",
    )
    result = train(prior, gaussian_nll_criterion(), cfg)
    assert len(result.positional_losses) == 8


def test_eval_harness_runs():
    prior = GPPrior(num_features=1, noise=1e-4, outputscale=1.0, lengthscale=0.6)
    ys = sample_y_for_buckets(prior, 5000, 20)
    crit = bar_criterion(get_bucket_limits(30, ys=ys, full_range=(-4, 4)))
    cfg = TrainConfig(
        emsize=32,
        nhid=64,
        nlayers=2,
        nhead=4,
        epochs=1,
        steps_per_epoch=4,
        batch_size=16,
        bptt=20,
        lr=1e-3,
        warmup_epochs=1,
        verbose=False,
        attention_impl="dense",
    )
    result = train(prior, crit, cfg)
    x, y, target_y = prior.sample(jax.random.PRNGKey(5), 32, 20)
    means, stds = eval_positional_loss(
        result.model, result.params, crit, x, y, target_y, positions=[1, 5, 10]
    )
    assert means.shape == (3,)
    assert np.isfinite(np.asarray(means)).all()
    # The per-dataset matrix averages to the same positional means.
    from pfn_tpu.evals.harness import eval_positional_loss_per_dataset

    per = eval_positional_loss_per_dataset(
        result.model, result.params, crit, x, y, target_y,
        positions=[1, 5, 10],
    )
    assert per.shape == (3, 32)
    np.testing.assert_allclose(
        np.asarray(per).mean(axis=1), np.asarray(means), rtol=1e-5
    )
    # Posterior-summary path works on eval logits.
    logits = pfn_predict(result.model, result.params, x, y, 10)
    mean_pred = crit.mean(logits)
    assert mean_pred.shape == (32, 20)


def test_mixture_eval_pos_sampler_floors_small_contexts():
    """The mixture sampler guarantees small-context coverage that the pure
    weighted sampler starves (p(i<50) ~ 2% at max_len=2000), while keeping
    most mass on the weighted long-context profile."""
    from pfn_tpu.utils.samplers import make_eval_pos_weights

    max_len = 2000
    w = make_eval_pos_weights(max_len, "weighted")
    w = w / w.sum()
    m = make_eval_pos_weights(max_len, "mixture")
    np.testing.assert_allclose(float(m.sum()), 1.0, rtol=1e-5)
    # Uniform floor: every position < 300 gets at least 0.1/300.
    assert float(m[:300].min()) >= 0.1 / 300 - 1e-9
    # Small-context mass is boosted ~5x over pure weighted...
    assert float(m[:50].sum()) > 4 * float(w[:50].sum())
    # ...while the long-context tail keeps >= 85% of its weighted mass.
    assert float(m[1000:].sum()) > 0.85 * float(w[1000:].sum())

    # Registered and drawable inside the jitted step.
    from pfn_tpu.train.loop import _sample_eval_pos

    cfg = TrainConfig(bptt=64, eval_pos_sampler="mixture")
    draws = [int(_sample_eval_pos(jax.random.PRNGKey(i), cfg))
             for i in range(32)]
    assert all(0 <= d < 64 for d in draws) and len(set(draws)) > 5


def test_bucket_sample_seq_cap_widens_span():
    """max_seq_len decorrelates the throwaway bucket sample.

    At long seq_len the sample is a few highly-correlated GP draws, so the
    equal-mass span under-covers the marginal; capping the per-dataset
    length draws more independent functions and must widen the span (the
    mid-context tail-mass finding, docs/PERF.md bucket-resolution floor).
    """
    from pfn_tpu.priors.gp import GPPrior

    prior = GPPrior(num_features=1, noise=1e-4, outputscale=1.0,
                    lengthscale=0.6)
    ys_long = sample_y_for_buckets(prior, 20_000, 500, seed=7)
    ys_capped = sample_y_for_buckets(prior, 20_000, 500, seed=7,
                                     max_seq_len=50)
    assert ys_long.shape == ys_capped.shape == (20_000,)
    span_long = float(ys_long.max() - ys_long.min())
    span_capped = float(ys_capped.max() - ys_capped.min())
    assert span_capped > span_long
    # Default (no cap) is byte-identical to the pre-option behavior.
    ys_default = sample_y_for_buckets(prior, 20_000, 500, seed=7,
                                      max_seq_len=None)
    assert (ys_default == ys_long).all()

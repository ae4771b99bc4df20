"""Timing / tracing / debug instrumentation (SURVEY.md §5 aux subsystems)."""

import jax
import jax.numpy as jnp
import pytest

from pfn_tpu.utils.profiling import StepTimers, annotate, debug_nans


def test_step_timers_channels():
    t = StepTimers()
    x = jnp.ones((64, 64))
    with t.channel("mm", block_on=x):
        y = x @ x
    t.record("host", 0.5)
    means = t.means()
    assert means["mm"] >= 0.0
    assert means["host"] == 0.5
    assert "mm" in t.summary() and "host" in t.summary()
    t.reset()
    assert t.means() == {}


def test_debug_nans_scoped():
    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            jax.jit(lambda a: a / a)(jnp.zeros(4)).block_until_ready()
    assert jax.config.jax_debug_nans == before


def test_annotate_runs():
    @annotate("my_op")
    def f(a):
        return a * 2

    assert float(f(jnp.asarray(3.0))) == 6.0


def test_train_reports_step_time():
    from pfn_tpu.priors.ridge import RidgePrior
    from pfn_tpu.train import TrainConfig, mse_criterion, train

    cfg = TrainConfig(
        emsize=16, nhid=32, nlayers=1, nhead=2, epochs=1, steps_per_epoch=2,
        batch_size=4, bptt=8, lr=1e-3, warmup_epochs=1, verbose=False,
    )
    res = train(RidgePrior(num_features=2), mse_criterion(), cfg)
    assert res.epoch_stats[0]["step_time"] > 0

"""pfn_debug_checks: out-of-support bar targets fail loudly in debug mode.

Reference semantics: BarDistribution.forward ASSERTS targets are inside the
modeled support (bar_distribution.py:27-28). The TPU fast path clamps
silently (asserts don't exist inside jit); `pfn_debug_checks()` restores the
reference's fail-loudly contract by poisoning out-of-support NLLs with NaN
under jax_debug_nans.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pfn_tpu.distributions import BarDistribution, get_bucket_limits
from pfn_tpu.train import TrainConfig, bar_criterion
from pfn_tpu.train.loop import TrainState, build_model, make_train_step
from pfn_tpu.utils import pfn_debug_checks


@dataclasses.dataclass
class _MisScaledPrior:
    """A custom module-style prior emitting y far beyond the bar borders —
    the failure mode the debug check exists to catch."""

    num_features: int = 1
    num_outputs: int = 1

    def sample(self, key, batch_size, seq_len):
        kx, ky = jax.random.split(key)
        x = jax.random.uniform(kx, (batch_size, seq_len, 1))
        y = 100.0 + jax.random.normal(ky, (batch_size, seq_len))
        return x, y, y


def _one_step_loss():
    crit = bar_criterion(get_bucket_limits(10, full_range=(-3.0, 3.0)))
    prior = _MisScaledPrior()
    cfg = TrainConfig(
        emsize=16, nhid=32, nlayers=1, nhead=2, bptt=8, batch_size=4,
        steps_per_epoch=1, attention_impl="dense", verbose=False,
    )
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=8)
    tx = optax.sgd(0.0)
    step = jax.jit(make_train_step(model, prior, crit, cfg, tx))
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    _, metrics = step(state, jax.random.PRNGKey(1))
    return float(metrics["loss"])


def test_nll_poisons_out_of_support_only_in_debug_mode():
    bar = BarDistribution.create(get_bucket_limits(10, full_range=(-3.0, 3.0)))
    logits = jnp.zeros((3, 10))
    y = jnp.asarray([0.5, 99.0, -99.0])
    nll_plain = np.asarray(bar.nll(logits, y))
    assert np.isfinite(nll_plain).all(), "fast path clamps, stays finite"
    try:
        with pfn_debug_checks():
            nll_dbg = np.asarray(bar.nll(logits, y))
    except FloatingPointError:
        # jax_debug_nans may raise right at the op — equally acceptable.
        return
    assert np.isfinite(nll_dbg[0]) and np.isnan(nll_dbg[1:]).all()


def test_out_of_support_trains_silently_without_debug_mode():
    # Documented fast-path behavior: targets clamp to the end buckets and
    # the step completes with a finite loss.
    assert np.isfinite(_one_step_loss())


def test_out_of_support_raises_under_debug_mode():
    with pfn_debug_checks():
        with pytest.raises(FloatingPointError):
            _one_step_loss()


def test_in_support_targets_unaffected_by_debug_mode():
    bar = BarDistribution.create(get_bucket_limits(10, full_range=(-5.0, 5.0)))
    logits = jnp.zeros((2, 10))
    y = jnp.asarray([0.1, -0.2])
    with pfn_debug_checks():
        nll = np.asarray(bar.nll(logits, y))
    assert np.isfinite(nll).all()

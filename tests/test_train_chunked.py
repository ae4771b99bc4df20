"""Scan-chunked training (updates_per_call > 1): one dispatch per chunk."""

import jax
import jax.numpy as jnp

from pfn_tpu.priors.ridge import RidgePrior
from pfn_tpu.train import TrainConfig, mse_criterion, train


def _cfg(**kw):
    base = dict(
        emsize=16, nhid=32, nlayers=1, nhead=2, epochs=2, steps_per_epoch=8,
        batch_size=8, bptt=10, lr=1e-3, warmup_epochs=1, verbose=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_chunked_runs_and_counts_updates():
    prior = RidgePrior(num_features=2)
    res = train(prior, mse_criterion(), _cfg(updates_per_call=4))
    assert jnp.isfinite(res.final_loss)
    # Positional-loss bookkeeping still accounts every update's eval pos.
    assert float(jnp.nansum(jnp.asarray(res.positional_losses))) == float(
        jnp.nansum(jnp.asarray(res.positional_losses))
    )


def test_chunked_matches_unchunked_statistically():
    """Same total update count; the chunked run must reach a similar loss
    (streams differ, so compare coarsely)."""
    prior = RidgePrior(num_features=2)
    cfg_a = _cfg(epochs=6, steps_per_epoch=16)
    cfg_b = _cfg(epochs=6, steps_per_epoch=16, updates_per_call=8)
    res_a = train(prior, mse_criterion(), cfg_a)
    res_b = train(prior, mse_criterion(), cfg_b)
    assert abs(res_a.final_loss - res_b.final_loss) < 0.05


def test_chunk_divisibility_enforced():
    import pytest

    prior = RidgePrior(num_features=2)
    with pytest.raises(AssertionError):
        train(prior, mse_criterion(), _cfg(steps_per_epoch=6, updates_per_call=4))


def test_chunked_with_grad_accumulation():
    prior = RidgePrior(num_features=2)
    cfg = _cfg(steps_per_epoch=8, aggregate_k_gradients=2, updates_per_call=2)
    res = train(prior, mse_criterion(), cfg)
    assert jnp.isfinite(res.final_loss)

"""Host-fed training (data_iter): pre-rendered caches / out-of-fidelity data
drive the same fused step semantics as on-device priors."""

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.priors.ridge import RidgePrior
from pfn_tpu.train import TrainConfig, mse_criterion, train


def _cfg(**kw):
    base = dict(
        emsize=16, nhid=32, nlayers=1, nhead=2, epochs=6, steps_per_epoch=8,
        batch_size=8, bptt=10, lr=3e-3, warmup_epochs=1, verbose=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def _iter_from_prior(prior, batch_size, bptt, seed=0):
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield prior.sample(sub, batch_size, bptt)


def test_host_iter_training_learns():
    prior = RidgePrior(num_features=2)
    it = _iter_from_prior(prior, 8, 10)
    res = train(prior, mse_criterion(), _cfg(), data_iter=it)
    assert jnp.isfinite(res.final_loss)
    # Ridge prior MSE should fall well below the raw y variance.
    assert res.final_loss < 0.05


def test_host_iter_with_grad_accumulation():
    prior = RidgePrior(num_features=2)
    it = _iter_from_prior(prior, 8, 10, seed=1)
    res = train(
        prior, mse_criterion(),
        _cfg(steps_per_epoch=8, aggregate_k_gradients=2),
        data_iter=it,
    )
    assert jnp.isfinite(res.final_loss)


def test_cached_prior_training_end_to_end(tmp_path):
    """The native mmap cache feeds training through data_iter (the
    use_saved_from role end to end, reference stroke.py:81-84)."""
    from pfn_tpu.native import CachedPrior, write_prior_cache

    prior = RidgePrior(num_features=2)
    path = str(tmp_path / "r.pfnc")
    write_prior_cache(path, prior, num_batches=12, batch_size=8, seq_len=10)
    cached = CachedPrior(path)
    res = train(
        cached, mse_criterion(), _cfg(epochs=4),
        data_iter=cached.training_iter(),
    )
    assert jnp.isfinite(res.final_loss)
    assert res.final_loss < 0.2


def test_host_iter_rejects_chunking():
    import pytest

    prior = RidgePrior(num_features=2)
    with pytest.raises(AssertionError):
        train(prior, mse_criterion(), _cfg(updates_per_call=4),
              data_iter=_iter_from_prior(prior, 8, 10))

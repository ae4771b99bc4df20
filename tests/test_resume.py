"""Checkpoint/resume of the FULL training state (params, opt_state, step,
PRNG key, epoch) — SURVEY.md §5 "Checkpoint / resume": the reference saved
bare state_dicts by hand with no optimizer/step/key resume."""

import jax.numpy as jnp
import numpy as np

from pfn_tpu.priors.ridge import RidgePrior
from pfn_tpu.train import TrainConfig, mse_criterion, train


def _cfg(**kw):
    base = dict(
        emsize=16, nhid=32, nlayers=1, nhead=2, epochs=4, steps_per_epoch=4,
        batch_size=8, bptt=10, lr=1e-3, warmup_epochs=1, verbose=False,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    prior = RidgePrior(num_features=2)
    ckdir = str(tmp_path / "ck")

    # Uninterrupted 4-epoch run.
    res_full = train(prior, mse_criterion(), _cfg())

    # Same run, checkpointing every epoch, killed after epoch 2...
    res_half = train(
        prior, mse_criterion(),
        _cfg(epochs=2, checkpoint_dir=ckdir, checkpoint_every=1),
    )
    # ...then resumed to epoch 4. PRNG key/step/opt_state all restored, so
    # the resumed run replays the identical key sequence.
    res_resumed = train(
        prior, mse_criterion(),
        _cfg(epochs=4, checkpoint_dir=ckdir, checkpoint_every=1),
    )
    assert len(res_resumed.epoch_stats) == 2  # only epochs 3-4 ran
    assert res_resumed.epoch_stats[0]["epoch"] == 3
    np.testing.assert_allclose(
        res_resumed.final_loss, res_full.final_loss, rtol=1e-4
    )
    leaves_a = jnp.concatenate([
        jnp.ravel(x) for x in jax_tree_leaves(res_full.params)
    ])
    leaves_b = jnp.concatenate([
        jnp.ravel(x) for x in jax_tree_leaves(res_resumed.params)
    ])
    np.testing.assert_allclose(leaves_a, leaves_b, atol=1e-5)


def jax_tree_leaves(t):
    import jax

    return jax.tree.leaves(t)


def test_completed_run_is_noop_on_resume(tmp_path):
    prior = RidgePrior(num_features=2)
    ckdir = str(tmp_path / "ck")
    cfg = _cfg(epochs=2, checkpoint_dir=ckdir, checkpoint_every=1)
    train(prior, mse_criterion(), cfg)
    res = train(prior, mse_criterion(), cfg)
    assert res.epoch_stats == []  # nothing left to do


def test_checkpoint_pruning(tmp_path):
    """Only the newest checkpoint_keep checkpoints survive a long run."""
    import os

    prior = RidgePrior(num_features=2)
    ckdir = str(tmp_path / "ck")
    train(prior, mse_criterion(),
          _cfg(epochs=5, checkpoint_dir=ckdir, checkpoint_every=1,
               checkpoint_keep=2))
    names = sorted(os.listdir(ckdir))
    assert names == ["epoch_4", "epoch_5"]

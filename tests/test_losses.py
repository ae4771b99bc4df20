"""Criterion semantics: CE ignore-index normalization.

Reference semantics: ``torch.nn.CrossEntropyLoss(ignore_index=-100)`` means
over the NON-ignORED elements only (reference train.py:75-92), so with
only-last-idx priors (stroke.py:97-103) the loss scale must not depend on
how many ignored eval positions the sampled ``single_eval_pos`` exposes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pfn_tpu.train import TrainConfig, ce_criterion, mse_criterion
from pfn_tpu.train.loop import TrainState, build_model, make_train_step


def test_ce_valid_weight_masks_ignore_index():
    crit = ce_criterion(num_classes=3)
    targets = jnp.asarray([[0.0, -100.0, 2.0], [-100.0, 1.0, -100.0]])
    w = crit.valid_weight(targets)
    np.testing.assert_array_equal(np.asarray(w), [[1, 0, 1], [0, 1, 0]])
    # Non-CE criterions score every position.
    np.testing.assert_array_equal(
        np.asarray(mse_criterion().valid_weight(targets)), np.ones((2, 3))
    )


@dataclasses.dataclass
class _LastIdxPrior:
    """Deterministic only-train-for-last-idx classification prior: targets are
    -100 everywhere except the final position (the stroke/omniglot shape)."""

    num_features: int = 2
    num_outputs: int = 2
    bptt: int = 8
    batch: int = 4

    def sample(self, key, batch_size, seq_len):
        del key  # deterministic: both train steps must see identical data
        kx, ky = jax.random.split(jax.random.PRNGKey(42))
        x = jax.random.normal(kx, (batch_size, seq_len, self.num_features))
        labels = jax.random.bernoulli(ky, 0.5, (batch_size, seq_len)).astype(
            jnp.float32
        )
        target_y = jnp.full((batch_size, seq_len), -100.0).at[:, -1].set(
            labels[:, -1]
        )
        return x, labels, target_y


@pytest.mark.parametrize("sep", [2, 5])
def test_ce_ignore_index_loss_scale_matches_fixed_pos(sep):
    """With only-last-idx targets, the reported CE loss must be identical
    whether single_eval_pos exposes 1 eval position (sep=T-1) or many
    (sep<T-1): ignored positions must not dilute the mean."""
    prior = _LastIdxPrior()
    crit = ce_criterion(num_classes=2)
    T = prior.bptt

    def loss_at(fixed_sep):
        cfg = TrainConfig(
            emsize=16, nhid=32, nlayers=1, nhead=2, bptt=T,
            batch_size=prior.batch, steps_per_epoch=1,
            eval_pos_sampler="fixed", fixed_eval_pos=fixed_sep,
            attention_impl="dense", verbose=False,
        )
        model = build_model(prior, crit, cfg)
        params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
        tx = optax.sgd(0.0)
        step = jax.jit(make_train_step(model, prior, crit, cfg, tx))
        state = TrainState(
            params=params, opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        _, metrics = step(state, jax.random.PRNGKey(1))
        return float(metrics["loss"])

    many_eval = loss_at(sep)       # T - sep eval positions, 1 valid
    one_eval = loss_at(T - 1)      # exactly the valid position
    assert many_eval == pytest.approx(one_eval, rel=1e-5), (
        f"CE loss diluted by ignored positions: sep={sep} -> {many_eval}, "
        f"sep={T - 1} -> {one_eval}"
    )

"""BatchMixture: static batch-split prior mixing (pfn_tpu/priors/mixture.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.priors.binarize import BinarizedPrior, binarized_gp_prior
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.priors.mixture import BatchMixture, _allocate
from pfn_tpu.priors.mlp import MLPPrior


def test_allocate_largest_remainder():
    assert _allocate(10, [0.5, 0.5]) == (5, 5)
    # 7.5 / 2.5 -> floors 7/2, remainder tie broken by index
    assert _allocate(10, [0.75, 0.25]) == (8, 2)
    assert sum(_allocate(7, [1, 1, 1])) == 7
    # every positive-weight component gets >= 1 row
    assert min(_allocate(4, [0.97, 0.01, 0.01, 0.01])) >= 1
    assert _allocate(8, [1.0, 0.0]) == (8, 0)
    with pytest.raises(ValueError):
        _allocate(8, [0.0, 0.0])


def test_mixture_shapes_padding_and_determinism():
    mix = BatchMixture(
        components=(
            MLPPrior(num_features=12, is_binary_classification=True),
            BinarizedPrior(base=GPPrior(num_features=4), num_outputs=1),
        ),
        weights=(0.5, 0.5),
    )
    assert mix.num_features == 12
    assert mix.num_outputs == 1
    key = jax.random.PRNGKey(0)
    x, y, t = jax.jit(lambda k: mix.sample(k, 8, 16))(key)
    assert x.shape == (8, 16, 12) and y.shape == (8, 16) and t.shape == (8, 16)
    # binary components: targets are {0,1} everywhere
    assert set(np.unique(np.asarray(t))) <= {0.0, 1.0}
    # GP rows (second half of the batch) are zero-padded beyond 4 features
    assert float(jnp.abs(x[4:, :, 4:]).max()) == 0.0
    # MLP rows are not all-zero in the wide columns
    assert float(jnp.abs(x[:4, :, 4:]).max()) > 0.0
    x2, y2, t2 = jax.jit(lambda k: mix.sample(k, 8, 16))(key)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t2))


def test_mixture_rejects_mismatched_outputs():
    clf1 = MLPPrior(num_features=4, is_binary_classification=True)  # n_out 1
    clf2 = binarized_gp_prior(num_features=4)  # n_out 2 (reference default)
    with pytest.raises(ValueError):
        BatchMixture(components=(clf1, clf2), weights=(0.5, 0.5))


def test_mixture_trains_one_step():
    from pfn_tpu.train import TrainConfig, bce_criterion, train

    mix = BatchMixture(
        components=(
            MLPPrior(num_features=6, is_binary_classification=True),
            BinarizedPrior(base=GPPrior(num_features=6), num_outputs=1),
        ),
        weights=(0.8, 0.2),
    )
    cfg = TrainConfig(
        emsize=16, nhid=32, nlayers=1, nhead=2, bptt=12, batch_size=8,
        epochs=1, steps_per_epoch=2, lr=1e-3, warmup_epochs=0,
    )
    result = train(mix, bce_criterion(), cfg)
    assert np.isfinite(result.final_loss)

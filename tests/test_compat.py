"""Reference-API compatibility shim tests (VERDICT r4 task 8).

Drives the GP-fitting workflow through ``pfn_tpu.compat`` exactly the way the
reference notebooks drive ``train.train`` (reference train.py:22-27,
SetupForGPFittingExperiments.ipynb cell 5), so reference-style driver code
runs unchanged modulo torch→jax arrays.
"""

import numpy as np
import pytest

from pfn_tpu import compat as ref
from pfn_tpu.train.checkpoints import export_torch_state_dict
from pfn_tpu.train.loop import TrainResult

HPS = {"noise": 1e-4, "outputscale": 1.0, "lengthscale": 0.1,
       "fast_computations": (False, False, False)}


def test_namespace_surface():
    # The exact module handles the reference notebooks touch.
    assert callable(ref.train)
    assert ref.Losses.gaussian.name == "gaussian"
    assert callable(ref.Losses.get_BarDistribution)
    for name in ("Linear", "Normalize", "MLP", "Embedding"):
        assert hasattr(ref.encoders, name)
    for name in ("NoPositionalEncoding", "PositionalEncoding",
                 "LearnedPositionalEncoding",
                 "PairedScrambledPositionalEncodings"):
        assert hasattr(ref.positional_encodings, name)
    assert callable(ref.bar_distribution.get_bucket_limits)
    assert callable(ref.utils.get_weighted_single_eval_pos_sampler)
    assert callable(ref.utils.get_cosine_schedule_with_warmup)
    assert callable(ref.utils.get_openai_lr)
    for prior in ("fast_gp", "fast_gp_mix", "ridge", "mlp"):
        assert hasattr(getattr(ref.priors, prior), "DataLoader")


def test_gp_fitting_workflow_runs_unchanged():
    """The notebook's driver snippet, at test scale: sample prior ys, build a
    FullSupportBarDistribution criterion, call ref.train with the weighted
    sampler + cosine schedule."""
    ys = ref.priors.fast_gp.get_batch(
        512, 12, 1, hyperparameters=HPS)[1]
    criterion = ref.bar_distribution.FullSupportBarDistribution(
        ref.bar_distribution.get_bucket_limits(20, ys=np.asarray(ys).ravel())
    )
    total_loss, pos_losses, result = ref.train(
        ref.priors.fast_gp.DataLoader,
        criterion,
        ref.encoders.Linear,
        emsize=32, nhead=4, nhid=64, nlayers=2,
        y_encoder_generator=ref.encoders.Linear,
        pos_encoder_generator=ref.positional_encodings.NoPositionalEncoding,
        extra_prior_kwargs_dict={"num_features": 1, "fuse_x_y": False,
                                 "hyperparameters": HPS},
        single_eval_pos_gen=ref.utils.get_weighted_single_eval_pos_sampler(12),
        bptt=12, batch_size=8, aggregate_k_gradients=1, epochs=2,
        steps_per_epoch=4, lr=1e-3, warmup_epochs=1,
        scheduler=ref.utils.get_cosine_schedule_with_warmup,
        verbose=False, attention_impl="dense",
    )
    assert np.isfinite(total_loss)
    assert len(pos_losses) > 0 and np.all(np.isfinite(np.asarray(pos_losses)))
    assert isinstance(result, TrainResult)
    assert result.params is not None and result.model is not None


def test_gaussian_loss_and_uniform_sampler():
    total_loss, _, result = ref.train(
        ref.priors.ridge.DataLoader,
        ref.Losses.gaussian,
        ref.encoders.Linear,
        emsize=32, nhead=4, nhid=64, nlayers=2,
        y_encoder_generator=ref.encoders.Linear,
        extra_prior_kwargs_dict={"num_features": 2, "noisy_std": 0.1},
        single_eval_pos_gen=ref.utils.get_uniform_single_eval_pos_sampler(),
        bptt=10, batch_size=8, epochs=1, steps_per_epoch=4, lr=1e-3,
        warmup_epochs=1, verbose=False, attention_impl="dense",
    )
    assert np.isfinite(total_loss)


def test_load_weights_from_torch_state_dict():
    """The reference's warm-start path: a torch-style state_dict handed to
    train(load_weights_from_this_state_dict=...) initializes the flax params
    (train.py:46-47)."""
    import jax

    from pfn_tpu.models.transformer import PFNTransformer, TransformerConfig

    nlayers, emsize, nhead, nhid, n_out = 2, 32, 4, 64, 20
    model = PFNTransformer(TransformerConfig(
        emsize=emsize, nhead=nhead, nhid=nhid, nlayers=nlayers,
        num_features=1, n_out=n_out))
    variables = model.init_params(jax.random.PRNGKey(0), seq_len=10)
    sd = export_torch_state_dict(variables, nlayers)

    ys = np.linspace(-2, 2, 512)
    criterion = ref.bar_distribution.BarDistribution(
        ref.bar_distribution.get_bucket_limits(n_out, ys=ys))
    total_loss, _, result = ref.train(
        ref.priors.fast_gp.DataLoader,
        criterion,
        ref.encoders.Linear,
        emsize=emsize, nhead=nhead, nhid=nhid, nlayers=nlayers,
        y_encoder_generator=ref.encoders.Linear,
        extra_prior_kwargs_dict={"num_features": 1, "hyperparameters": HPS},
        load_weights_from_this_state_dict=sd,
        bptt=10, batch_size=8, epochs=1, steps_per_epoch=2, lr=1e-4,
        warmup_epochs=1, verbose=False, attention_impl="dense",
    )
    assert np.isfinite(total_loss)


def test_unsupported_surface_raises_not_silently():
    with pytest.raises(TypeError):
        ref.train(object(), ref.Losses.mse, ref.encoders.Linear)
    with pytest.raises(NotImplementedError):
        ref.train(
            ref.priors.fast_gp.DataLoader, ref.Losses.mse,
            ref.encoders.Linear,
            extra_prior_kwargs_dict={"num_features": 1, "fuse_x_y": True,
                                     "hyperparameters": HPS},
            verbose=False,
        )
    with pytest.raises(TypeError):
        ref.train(
            ref.priors.fast_gp.DataLoader, object(), ref.encoders.Linear,
            extra_prior_kwargs_dict={"num_features": 1,
                                     "hyperparameters": HPS},
            verbose=False,
        )

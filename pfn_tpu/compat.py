"""Reference-API compatibility shim.

Exposes the upstream module surface — ``train(...)`` (reference
train.py:22-135), ``Losses`` (train.py:15-20), ``priors.fast_gp.DataLoader``
/ ``priors.fast_gp_mix`` / ``priors.ridge`` / ``priors.mlp`` handles,
``encoders`` (encoders.py), ``positional_encodings``
(positional_encodings.py), ``bar_distribution`` (bar_distribution.py) and
``utils`` sampler/schedule helpers (utils.py:46-73) — on top of the TPU
framework, so reference-style driver code runs unchanged modulo torch→jax
arrays:

    from pfn_tpu import compat as ref

    ys = ref.priors.fast_gp.get_batch(100_000, 20, 1, hyperparameters=hps)[1]
    total_loss, pos_losses, result = ref.train(
        ref.priors.fast_gp.DataLoader,
        ref.bar_distribution.FullSupportBarDistribution(
            ref.bar_distribution.get_bucket_limits(1000, ys=ys)),
        ref.encoders.Linear,
        emsize=512, nhead=4, nhid=1024, nlayers=6,
        y_encoder_generator=ref.encoders.Linear,
        pos_encoder_generator=ref.positional_encodings.NoPositionalEncoding,
        extra_prior_kwargs_dict={'num_features': 1, 'fuse_x_y': False,
                                 'hyperparameters': hps},
        single_eval_pos_gen=ref.utils.get_weighted_single_eval_pos_sampler(2000),
        bptt=2010, batch_size=4, aggregate_k_gradients=25, epochs=1250,
        lr=1e-4, scheduler=ref.utils.get_cosine_schedule_with_warmup)

The third return element is the framework's :class:`~pfn_tpu.train.loop.
TrainResult` — the jax-idiomatic "model" handle (the reference returns a
stateful ``nn.Module``; here params live in ``result.params`` and the pure
module in ``result.model``; ``result`` feeds every downstream eval API).
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace
from typing import Any, Callable

import jax
import numpy as np

from pfn_tpu import distributions as _dist
from pfn_tpu.models import encoders as _enc
from pfn_tpu.models import positional as _pos
from pfn_tpu.train import loop as _loop
from pfn_tpu.train import losses as _losses
from pfn_tpu.train.checkpoints import import_torch_state_dict
from pfn_tpu.utils import schedules as _sched

__all__ = [
    "train", "Losses", "priors", "encoders", "positional_encodings",
    "bar_distribution", "utils",
]


# ---- losses namespace (reference train.py:15-20) ---------------------------

class _LossMarker:
    def __init__(self, name: str):
        self.name = name

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<compat loss {self.name}>"


class Losses:
    """Sentinels standing in for the reference's torch loss instances."""

    gaussian = _LossMarker("gaussian")
    mse = _LossMarker("mse")
    ce = _LossMarker("ce")
    bce = _LossMarker("bce")
    get_BarDistribution = _dist.BarDistribution.create


# ---- bar_distribution namespace --------------------------------------------

bar_distribution = SimpleNamespace(
    get_bucket_limits=_dist.get_bucket_limits,
    # The reference constructs these classes directly from borders
    # (bar_distribution.py:7, 146); ours build through .create.
    BarDistribution=_dist.BarDistribution.create,
    FullSupportBarDistribution=_dist.FullSupportBarDistribution.create,
)


# ---- encoders / positional encodings ----------------------------------------
# Reference encoder generators are called (num_features, emsize); the flax
# modules take emsize only (num_features is inferred from the input), so the
# names map straight onto the module classes.

encoders = SimpleNamespace(
    Linear=_enc.LinearEncoder,
    Normalize=_enc.Normalize,
    NormalizedUniform=_enc.NormalizedUniformEncoder,
    MLP=_enc.MLPEncoder,
    Embedding=_enc.EmbeddingEncoder,
    CanonicalEmbedding=_enc.CanonicalEmbedding,
)

positional_encodings = SimpleNamespace(
    NoPositionalEncoding=_pos.NoPositionalEncoding,
    PositionalEncoding=_pos.SinusoidalPositionalEncoding,
    LearnedPositionalEncoding=_pos.LearnedPositionalEncoding,
    PairedScrambledPositionalEncodings=_pos.PairedScrambledPositionalEncodings,
)


# ---- eval-position samplers + schedules (reference utils.py:46-73) ----------

@dataclasses.dataclass(frozen=True)
class _EvalPosSampler:
    kind: str
    max_len: int | None = None


def get_weighted_single_eval_pos_sampler(max_len: int) -> _EvalPosSampler:
    return _EvalPosSampler("weighted", max_len)


def get_uniform_single_eval_pos_sampler(max_len: int | None = None) -> _EvalPosSampler:
    return _EvalPosSampler("uniform", max_len)


utils = SimpleNamespace(
    get_weighted_single_eval_pos_sampler=get_weighted_single_eval_pos_sampler,
    get_uniform_single_eval_pos_sampler=get_uniform_single_eval_pos_sampler,
    get_cosine_schedule_with_warmup=_sched.cosine_schedule_with_warmup,
    get_openai_lr=_sched.get_openai_lr,
)


# ---- prior handles -----------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _PriorHandle:
    """Stands in for a reference DataLoader class (priors/utils.py:14-42):
    ``train`` instantiates it with ``extra_prior_kwargs_dict``."""

    name: str
    make: Callable[..., Any]
    num_outputs: int = 1
    fuse_x_y: bool = False

    # reference DataLoader classmethod surface used by the notebooks
    def get_batch_method(self, batch_size, seq_len, num_features,
                         hyperparameters=None, device=None, **kw):
        prior = self.make(num_features=num_features,
                          hyperparameters=hyperparameters)
        x, y, target_y = prior.sample(
            jax.random.PRNGKey(0), batch_size, seq_len
        )
        return x, y, target_y


def _make_gp(num_features=1, hyperparameters=None, **kw):
    from pfn_tpu.priors.gp import GPPrior

    hp = dict(hyperparameters or {})
    hp.pop("fast_computations", None)  # gpytorch switch; XLA has no analog
    defaults = dict(noise=0.1, outputscale=0.1, lengthscale=0.1)
    if isinstance(hp, dict):
        defaults.update({k: hp[k] for k in ("noise", "outputscale",
                                            "lengthscale") if k in hp})
    return GPPrior(num_features=num_features, **defaults, **kw)


def _make_gp_mix(num_features=1, hyperparameters=None, **kw):
    from pfn_tpu.priors.gp_mix import GPHyperpriorMixture

    return GPHyperpriorMixture(num_features=num_features,
                               **(hyperparameters or {}), **kw)


def _make_ridge(num_features=1, hyperparameters=None, **kw):
    from pfn_tpu.priors.ridge import RidgePrior

    return RidgePrior(num_features=num_features, **(hyperparameters or {}),
                      **kw)


def _make_mlp(num_features=1, hyperparameters=None, **kw):
    from pfn_tpu.priors.mlp import MLPPrior

    return MLPPrior(num_features=num_features, **(hyperparameters or {}),
                    **kw)


priors = SimpleNamespace(
    fast_gp=SimpleNamespace(
        DataLoader=_PriorHandle("fast_gp", _make_gp),
        get_batch=lambda batch_size, seq_len, num_features, device=None,
        hyperparameters=None, **kw: _make_gp(
            num_features=num_features, hyperparameters=hyperparameters
        ).sample(jax.random.PRNGKey(0), batch_size, seq_len),
    ),
    fast_gp_mix=SimpleNamespace(DataLoader=_PriorHandle("fast_gp_mix",
                                                        _make_gp_mix)),
    ridge=SimpleNamespace(DataLoader=_PriorHandle("ridge", _make_ridge)),
    mlp=SimpleNamespace(DataLoader=_PriorHandle("mlp", _make_mlp)),
)


# ---- criterion mapping -------------------------------------------------------

def _to_criterion(criterion, num_classes_hint: int | None = None):
    if isinstance(criterion, _losses.Criterion):
        return criterion
    if isinstance(criterion, _dist.FullSupportBarDistribution):
        return _losses.full_support_bar_criterion(criterion.borders)
    if isinstance(criterion, _dist.BarDistribution):
        return _losses.bar_criterion(criterion.borders)
    if isinstance(criterion, _LossMarker):
        if criterion.name == "gaussian":
            return _losses.gaussian_nll_criterion()
        if criterion.name == "mse":
            return _losses.mse_criterion()
        if criterion.name == "bce":
            return _losses.bce_criterion()
        if criterion.name == "ce":
            return _losses.ce_criterion(num_classes_hint or 2)
    raise TypeError(
        f"unsupported criterion {criterion!r}: pass a pfn_tpu Criterion, a "
        "(FullSupport)BarDistribution, or a compat.Losses member"
    )


# ---- the train() shim ---------------------------------------------------------

def train(priordataloader_class, criterion, encoder_generator, emsize=200,
          nhid=200, nlayers=6, nhead=2, dropout=0.2, epochs=10,
          steps_per_epoch=100, batch_size=200, bptt=10, lr=None,
          warmup_epochs=10, input_normalization=False,
          y_encoder_generator=None, pos_encoder_generator=None, decoder=None,
          extra_prior_kwargs_dict={}, scheduler=None,
          load_weights_from_this_state_dict=None, validation_period=10,
          single_eval_pos_gen=None, gpu_device=None, aggregate_k_gradients=1,
          verbose=True, num_classes=None, **train_config_overrides):
    """The reference ``train`` signature (train.py:22-27) on the TPU loop.

    Differences, all documented rather than silent:
      * ``gpu_device`` is accepted and ignored — placement is jax's.
      * ``scheduler`` accepts the compat cosine handle or None (the loop's
        schedule IS warmup+cosine, utils/schedules.py); anything else raises.
      * ``single_eval_pos_gen`` must be a compat sampler handle or None
        (uniform) — arbitrary host callables cannot run inside the jitted
        step; the two reference samplers (utils.py:59-73) are built in.
      * extra keyword arguments pass through to :class:`TrainConfig`
        (checkpoint_dir, dtype, fsdp, ... — TPU-native surface).
    Returns ``(final_mean_loss, positional_losses, result)`` with ``result``
    the :class:`TrainResult` (the reference returns the torch module; the
    params/model pair lives in ``result``).
    """
    if not isinstance(priordataloader_class, _PriorHandle):
        raise TypeError(
            "priordataloader_class must be a compat prior handle, e.g. "
            "compat.priors.fast_gp.DataLoader"
        )
    pk = dict(extra_prior_kwargs_dict)
    num_features = pk.pop("num_features", 1)
    fuse_x_y = pk.pop("fuse_x_y", False)
    if fuse_x_y:
        raise NotImplementedError(
            "fuse_x_y=True (the deprecated fused-token input path, reference "
            "transformer.py:49-51) is not carried over; use the default "
            "separate x/y encoders"
        )
    prior = priordataloader_class.make(num_features=num_features, **pk)

    crit = _to_criterion(criterion, num_classes_hint=num_classes)

    if scheduler is not None and scheduler is not _sched.cosine_schedule_with_warmup:
        raise NotImplementedError(
            "only the warmup+cosine schedule is supported "
            "(compat.utils.get_cosine_schedule_with_warmup)"
        )

    if single_eval_pos_gen is None:
        sampler_kind, eval_pos_max = "uniform", None
    elif isinstance(single_eval_pos_gen, _EvalPosSampler):
        sampler_kind, eval_pos_max = (single_eval_pos_gen.kind,
                                      single_eval_pos_gen.max_len)
    elif isinstance(single_eval_pos_gen, int):
        sampler_kind, eval_pos_max = "fixed", single_eval_pos_gen
    else:
        raise NotImplementedError(
            "single_eval_pos_gen must be a compat sampler handle, an int, or "
            "None — host callables cannot run inside the jitted train step"
        )

    cfg = _loop.TrainConfig(
        emsize=emsize, nhid=nhid, nlayers=nlayers, nhead=nhead,
        dropout=dropout, epochs=epochs, steps_per_epoch=steps_per_epoch,
        batch_size=batch_size, bptt=bptt, lr=lr,
        warmup_epochs=warmup_epochs, input_normalization=input_normalization,
        aggregate_k_gradients=aggregate_k_gradients,
        eval_pos_sampler=sampler_kind,
        eval_pos_max=eval_pos_max,
        fixed_eval_pos=eval_pos_max if sampler_kind == "fixed" else None,
        validation_period=validation_period,
        verbose=verbose,
        encoder=encoder_generator,
        y_encoder=y_encoder_generator,
        pos_encoder=pos_encoder_generator,
        decoder=decoder,
        **train_config_overrides,
    )

    init_params = None
    if load_weights_from_this_state_dict is not None:
        sd = load_weights_from_this_state_dict
        if "params" in sd:  # already a flax variables tree
            init_params = sd
        elif any("." in str(k) for k in sd):  # torch state_dict key style
            # import_torch_state_dict returns the full variables tree
            # ({"params": ...}) — do not wrap again.
            init_params = import_torch_state_dict(sd, nlayers)
        else:
            init_params = sd

    result = _loop.train(prior, crit, cfg, init_params=init_params)
    return result.final_loss, result.positional_losses, result

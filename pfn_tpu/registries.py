"""Named registries for priors, criterions, encoders, and samplers.

Parity: the reference wires everything through ad-hoc ``if/elif`` registries
inside ``train.py.__main__`` — priors at train.py:193-202, losses at
train.py:221-237, encoders at train.py:244-250, positional encodings at
train.py:253-269, eval-position samplers at train.py:271-280. Here each
registry is a first-class named table so drivers, the CLI, and configs share
one source of truth, and user code can ``register`` its own entries (the
"bring your own prior" story of reference priors/pyro.py / README.md:38-76).
"""

from __future__ import annotations

from typing import Any, Dict


class Registry:
    """A named table of constructors with decorator-style registration."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str, obj: Any = None):
        if obj is None:  # decorator form

            def deco(f):
                self._entries[name] = f
                return f

            return deco
        self._entries[name] = obj
        return obj

    def get(self, name: str) -> Any:
        if name not in self._entries:
            raise KeyError(
                f"unknown {self.kind} {name!r}; available: {sorted(self._entries)}"
            )
        return self._entries[name]

    def names(self):
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries


PRIORS = Registry("prior")
CRITERIONS = Registry("criterion")
ENCODERS = Registry("encoder")
POS_ENCODERS = Registry("positional encoding")
EVAL_POS_SAMPLERS = Registry("eval-pos sampler")


def _register_builtins():
    # ---- priors (reference train.py:193-202: gp / ridge / stroke / mix_gp;
    # plus the priors other drivers construct directly) ----------------------
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.priors.gp_mix import GPMixPrior
    from pfn_tpu.priors.mlp import MLPPrior
    from pfn_tpu.priors.ridge import RidgePrior
    from pfn_tpu.priors.binarize import (
        binarized_gp_mix_prior,
        binarized_gp_prior,
    )
    from pfn_tpu.priors.stroke import StrokePrior

    PRIORS.register("gp", GPPrior)
    PRIORS.register("stroke", StrokePrior)
    PRIORS.register("ridge", RidgePrior)
    PRIORS.register("mix_gp", GPMixPrior)
    PRIORS.register("mlp", MLPPrior)
    PRIORS.register("bnn", MLPPrior)
    PRIORS.register("binarized_gp", binarized_gp_prior)
    PRIORS.register("binarized_mix_gp", binarized_gp_mix_prior)

    # ---- criterions (reference train.py:221-237). Each entry is a builder
    # ``(prior, num_buckets, full_range, y_sample_size, seq_len) -> Criterion``
    # so adaptive bucket estimation (the throwaway-dataloader trick,
    # train.py:214-219) lives behind the registry too. --------------------
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.priors.base import sample_y_for_buckets
    from pfn_tpu.train.losses import (
        bar_criterion,
        bce_criterion,
        ce_criterion,
        full_support_bar_criterion,
        gaussian_nll_criterion,
        mse_criterion,
    )

    def _adaptive_borders(prior, num_buckets, y_sample_size, seq_len, full_range):
        ys = sample_y_for_buckets(prior, y_sample_size, seq_len)
        return get_bucket_limits(num_buckets, full_range=full_range, ys=ys)

    def _make_ce(prior, **kw):
        # Head width defaults to the PRIOR's class count (e.g. n-way stroke/
        # omniglot episodes) — a fixed default of 2 would silently clip
        # labels >= 2 in multi-class training.
        num_classes = kw.get("num_classes", getattr(prior, "num_outputs", 2))
        if num_classes < 2:
            raise ValueError(
                f"'ce' needs num_classes >= 2, resolved {num_classes} (the "
                f"prior reports num_outputs={getattr(prior, 'num_outputs', '?')} "
                "— a regression prior? pass --set criterion.kwargs."
                "num_classes=K or use a classification prior/criterion)"
            )
        return ce_criterion(num_classes)

    CRITERIONS.register("ce", _make_ce)
    CRITERIONS.register("gaussnll", lambda prior, **kw: gaussian_nll_criterion())
    CRITERIONS.register("mse", lambda prior, **kw: mse_criterion())
    CRITERIONS.register("bce", lambda prior, **kw: bce_criterion())
    CRITERIONS.register(
        "barnll",
        lambda prior, **kw: bar_criterion(
            get_bucket_limits(
                kw.get("num_buckets", 100),
                full_range=kw.get("full_range", (-4.0, 4.0)),
            )
        ),
    )
    CRITERIONS.register(
        "adaptivebarnll",
        lambda prior, **kw: bar_criterion(
            _adaptive_borders(
                prior,
                kw.get("num_buckets", 100),
                kw.get("y_sample_size", 100_000),
                kw.get("seq_len", 100),
                kw.get("full_range"),
            )
        ),
    )
    CRITERIONS.register(
        "adaptivefullsupportbarnll",
        lambda prior, **kw: full_support_bar_criterion(
            _adaptive_borders(
                prior,
                kw.get("num_buckets", 100),
                kw.get("y_sample_size", 100_000),
                kw.get("seq_len", 100),
                kw.get("full_range"),
            )
        ),
    )

    # ---- encoders (reference train.py:244-250) -----------------------------
    from pfn_tpu.models.encoders import (
        CanonicalEmbedding,
        EmbeddingEncoder,
        LinearEncoder,
        MLPEncoder,
        NormalizedUniformEncoder,
    )

    ENCODERS.register("linear", LinearEncoder)
    ENCODERS.register("normalized_uniform", NormalizedUniformEncoder)
    ENCODERS.register("mlp", MLPEncoder)
    ENCODERS.register("canonical", CanonicalEmbedding)
    ENCODERS.register("embedding", EmbeddingEncoder)

    # ---- positional encodings (reference train.py:253-269) -----------------
    from pfn_tpu.models.positional import (
        LearnedPositionalEncoding,
        NoPositionalEncoding,
        PairedScrambledPositionalEncodings,
        SinusoidalPositionalEncoding,
    )

    POS_ENCODERS.register("none", NoPositionalEncoding)
    POS_ENCODERS.register("sinus", SinusoidalPositionalEncoding)
    POS_ENCODERS.register("learned", LearnedPositionalEncoding)
    POS_ENCODERS.register(
        "paired_scrambled_learned", PairedScrambledPositionalEncodings
    )

    # ---- eval-pos samplers (reference train.py:271-280, utils.py:59-73).
    # Entries are weight functions ``max_len -> unnormalized weights``; the
    # train loop resolves TrainConfig.eval_pos_sampler through this table,
    # so registering a custom entry changes training. ----------------------
    from pfn_tpu.utils.samplers import make_eval_pos_weights

    EVAL_POS_SAMPLERS.register(
        "uniform", lambda max_len: make_eval_pos_weights(max_len, "uniform")
    )
    EVAL_POS_SAMPLERS.register(
        "weighted", lambda max_len: make_eval_pos_weights(max_len, "weighted")
    )
    EVAL_POS_SAMPLERS.register(
        "mixture", lambda max_len: make_eval_pos_weights(max_len, "mixture")
    )


_register_builtins()

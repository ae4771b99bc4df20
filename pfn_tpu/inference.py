"""User-facing amortized inference: ``fit`` stores the context, ``predict``
is ONE batched forward pass — no per-dataset training ever happens.

The reference exposes amortized inference only through its eval scripts:
the per-window forward with prefix-stat z-scoring at reference
tabular.py:285-302, the `run_test` sweep of the GP notebook
(SetupForGPFittingExperiments.ipynb cell 6), and `eval_transformer`
(mcmc_svi_transformer_on_bayesian.py:270-291). This module packages that
call pattern (SURVEY.md §3.2) behind the familiar estimator idiom:

    reg = PFNRegressor.from_train_result(result)
    reg.fit(X_ctx, y_ctx)              # stores context — O(1)
    mean = reg.predict(X_query)        # one forward
    lo, hi = reg.predict_quantiles(X_query, (0.05, 0.95))

    clf = PFNClassifier.from_train_result(result).fit(X_ctx, labels)
    p = clf.predict_proba(X_query)

Posterior summaries come from the criterion head: bar / full-support bar
(mean, quantiles, NLL, samples — bar_distribution.py:35-80 roles), the
2-headed Gaussian (train.py:78-84), or BCE/CE logits (tabular.py:298).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import functools

from pfn_tpu.evals.harness import pfn_predict
from pfn_tpu.priors.transforms import normalize_by_used_features
from pfn_tpu.train.losses import Criterion

_pfn_predict_jit = functools.partial(jax.jit, static_argnums=(0,))(pfn_predict)


@dataclasses.dataclass
class _PFNEstimator:
    """Shared context handling for the regressor/classifier front-ends.

    ``normalize_x=True`` z-scores every column by the CONTEXT's mean/std
    (both context and queries), the reference tabular protocol
    (tabular.py:288-296). Features beyond the model's ``num_features`` are
    rejected; fewer are zero-padded and rescaled by the used-feature
    fraction (priors/utils.py:81-82 role).
    """

    model: Any
    params: Any
    criterion: Criterion
    normalize_x: bool = False
    _ctx_x: np.ndarray | None = None
    _ctx_y: np.ndarray | None = None

    # ---- constructors -------------------------------------------------------
    @classmethod
    def from_train_result(cls, result, **kw):
        """Wrap a pfn_tpu.train.train(...) TrainResult."""
        return cls(result.model, result.params, result.criterion, **kw)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, prior, criterion, cfg, **kw):
        """Rebuild the model from its TrainConfig and load the newest
        full-state checkpoint written by train(checkpoint_dir=...)."""
        from pfn_tpu.train.checkpoints import (
            latest_state_checkpoint,
            restore_checkpoint,
        )
        from pfn_tpu.train.loop import build_model

        model = build_model(prior, criterion, cfg)
        latest = latest_state_checkpoint(checkpoint_dir)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {checkpoint_dir}")
        restored = restore_checkpoint(latest[0])
        return cls(model, restored["state"]["params"], criterion, **kw)

    # ---- context ------------------------------------------------------------
    @property
    def num_features(self) -> int:
        return self.model.config.num_features

    def fit(self, X, y):
        """Store the context set (n_ctx, f), (n_ctx,). No training happens —
        conditioning is amortized into the forward pass."""
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32)
        assert X.ndim == 2 and y.shape == (X.shape[0],), (X.shape, y.shape)
        assert X.shape[1] <= self.num_features, (
            f"{X.shape[1]} features > model num_features={self.num_features}"
        )
        self._ctx_x, self._ctx_y = X, y
        return self

    def _pack(self, Xq: np.ndarray):
        """Context + queries -> model inputs (1, T, F), (1, T), sep."""
        assert self._ctx_x is not None, "call fit(X, y) first"
        n_ctx = self._ctx_x.shape[0]
        Xq = np.asarray(Xq, np.float32)
        if Xq.shape[1] != self._ctx_x.shape[1]:
            raise ValueError(
                f"query matrix has {Xq.shape[1]} features but fit() saw "
                f"{self._ctx_x.shape[1]}"
            )
        x = np.concatenate([self._ctx_x, Xq], axis=0)
        if self.normalize_x:
            mu = x[:n_ctx].mean(axis=0, keepdims=True)
            sd = x[:n_ctx].std(axis=0, keepdims=True) + 1e-6
            x = (x - mu) / sd
        f = x.shape[1]
        if f < self.num_features:
            x = np.pad(x, ((0, 0), (0, self.num_features - f)))
            x = np.asarray(
                normalize_by_used_features(jnp.asarray(x), f, self.num_features)
            )
        y = np.concatenate(
            [self._ctx_y, np.zeros(len(Xq), np.float32)], axis=0
        )
        return x[None], y[None], n_ctx

    def _logits(self, Xq) -> jax.Array:
        """One forward; returns logits for the query rows: (n_query, n_out)."""
        Xq = np.asarray(Xq, np.float32)
        assert Xq.ndim == 2, "queries must be (n_query, n_features)"
        x, y, sep = self._pack(Xq)
        # Jitted with the model static: repeated predicts at the same shapes
        # reuse one compiled program instead of eager per-op dispatch.
        out = _pfn_predict_jit(
            self.model, self.params, jnp.asarray(x), jnp.asarray(y), sep
        )
        return out[0, sep:]


class PFNRegressor(_PFNEstimator):
    """Posterior-predictive regression from a bar-head or Gaussian-head PFN."""

    def predict(self, Xq, return_std: bool = False):
        if self.criterion.kind not in ("gaussian", "bar", "full_bar", "mse"):
            raise ValueError(
                f"criterion {self.criterion.kind!r} is not a regression head "
                "— use PFNClassifier for bce/ce models"
            )
        logits = self._logits(Xq)
        if self.criterion.kind == "mse":
            if return_std:
                raise ValueError("an MSE head carries no uncertainty")
            return np.asarray(logits[..., 0])
        if self.criterion.kind == "gaussian":
            mean = logits[..., 0]
            var = jnp.maximum(jnp.abs(logits[..., 1]), 1e-6)
        else:
            bar = self.criterion.bar
            mean = bar.mean(logits)
            if return_std:
                # E[y^2] per bucket: mid^2 + width^2/12 (uniform within the
                # bucket); tail buckets of the full-support head are treated
                # as their base-bucket span (documented approximation).
                p = jax.nn.softmax(logits, axis=-1)
                mids = bar.bucket_means
                ey2 = jnp.sum(
                    p * (mids**2 + bar.bucket_widths**2 / 12.0), axis=-1
                )
                var = jnp.maximum(ey2 - mean**2, 0.0)
        if return_std:
            return np.asarray(mean), np.asarray(jnp.sqrt(var))
        return np.asarray(mean)

    def predict_quantiles(self, Xq, qs: Sequence[float]):
        """(len(qs), n_query) posterior quantiles (bar heads only)."""
        if self.criterion.kind not in ("bar", "full_bar"):
            raise ValueError(
                f"criterion {self.criterion.kind!r} is not a bar-distribution "
                "head — quantiles need a bar/full_bar model"
            )
        logits = self._logits(Xq)
        return np.asarray(
            jnp.stack([self.criterion.bar.icdf(logits, q) for q in qs])
        )

    def sample(self, key, Xq, num_samples: int = 1):
        """(num_samples, n_query) draws from the posterior predictive."""
        if self.criterion.kind not in ("bar", "full_bar"):
            raise ValueError(
                f"criterion {self.criterion.kind!r} is not a bar-distribution "
                "head — posterior sampling needs a bar/full_bar model"
            )
        logits = self._logits(Xq)
        keys = jax.random.split(key, num_samples)
        return np.asarray(
            jnp.stack([self.criterion.bar.sample(k, logits) for k in keys])
        )

    def nll(self, Xq, yq):
        """Mean posterior-predictive NLL of true targets at the queries."""
        logits = self._logits(Xq)
        losses = self.criterion.per_position(
            logits[None], jnp.asarray(yq, jnp.float32)[None]
        )
        return float(losses.mean())


class PFNClassifier(_PFNEstimator):
    """Zero-shot classification from a BCE- or CE-head PFN (the tabular
    protocol: labels as float y-inputs, sigmoid/softmax read-out)."""

    classes_: np.ndarray | None = None

    def fit(self, X, y):
        self.classes_ = np.unique(np.asarray(y))
        n = len(self.classes_)
        if self.criterion.kind == "bce":
            assert n <= 2, "BCE head is binary"
        elif self.criterion.kind == "ce":
            assert n <= self.criterion.num_classes
        else:
            raise ValueError(
                f"classifier needs a bce/ce criterion, got {self.criterion.kind}"
            )
        codes = np.searchsorted(self.classes_, np.asarray(y))
        return super().fit(X, codes.astype(np.float32))

    def predict_proba(self, Xq) -> np.ndarray:
        logits = self._logits(Xq)
        if self.criterion.kind == "bce":
            p1 = jax.nn.sigmoid(logits[..., 0])
            probs = jnp.stack([1.0 - p1, p1], axis=-1)
            return np.asarray(probs[:, : max(len(self.classes_), 2)])
        # CE head: mask classes absent from the context BEFORE the softmax so
        # the returned rows are a proper distribution over observed classes.
        k = max(len(self.classes_), 2)
        probs = jax.nn.softmax(logits[:, :k], axis=-1)
        return np.asarray(probs)

    def predict(self, Xq) -> np.ndarray:
        codes = self.predict_proba(Xq).argmax(axis=-1)
        return self.classes_[np.minimum(codes, len(self.classes_) - 1)]

"""Riemann ("bar") distribution output head.

Distributional regression via a histogram over ``num_bars`` buckets. The head
doubles as the training loss (negative log density of a piecewise-constant
density) and as the posterior-summary API (mean / mode / quantile / cdf /
expected improvement) used by evaluation and Bayesian-optimization code.

Behavioral parity target: reference ``bar_distribution.py`` (BarDistribution
:5-80, FullSupportBarDistribution :83-117, get_bucket_limits :121-143). The
implementation here is a pure-functional JAX pytree: everything is jittable,
vmappable, and differentiable; there is no module state beyond the bucket
borders.

Intentional deviations from the reference (documented per SURVEY.md §7):
  * ``quantile`` is fully vectorized (the reference loops over rows in Python,
    bar_distribution.py:57-60) and handles the ``idx == 0`` edge correctly
    (the reference reads ``cumprobs[-1]`` through negative indexing there).
  * ``nll`` scores every position; the train step masks positions >= the
    traced ``single_eval_pos`` itself (the reference slices targets instead,
    which would break static shapes under jit).
  * ``get_bucket_limits`` repairs duplicate equal-mass borders (possible
    when the y sample has repeated values) instead of emitting zero-width
    buckets whose log-width is -inf in the NLL.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_HALF_LOG_2_OVER_PI = 0.5 * math.log(2.0 / math.pi)
# Standard half-normal inverse CDF at p: icdf(p) = sqrt(2) * erfinv(p).
_STD_HALFNORMAL_ICDF_05 = math.sqrt(2.0) * 0.47693627620446987  # erfinv(0.5)


def _halfnormal_scale(range_max: jax.Array, p: float = 0.5) -> jax.Array:
    """Scale s such that a HalfNormal(s) has CDF(range_max) == p.

    Parity: ``halfnormal_with_p_weight_before`` (bar_distribution.py:84-87).
    """
    icdf_p = math.sqrt(2.0) * float(jax.scipy.special.erfinv(p)) if p != 0.5 else _STD_HALFNORMAL_ICDF_05
    return range_max / icdf_p


def _halfnormal_logpdf(x: jax.Array, scale: jax.Array) -> jax.Array:
    return _HALF_LOG_2_OVER_PI - jnp.log(scale) - 0.5 * (x / scale) ** 2


def _halfnormal_mean(scale: jax.Array) -> jax.Array:
    return scale * math.sqrt(2.0 / math.pi)


@struct.dataclass
class BarDistribution:
    """Histogram distribution over ``num_bars`` buckets with given borders.

    ``borders`` is a sorted 1-D array of length ``num_bars + 1`` starting at
    the support minimum and ending at the support maximum. All methods accept
    ``logits`` of shape ``(..., num_bars)`` and broadcast over leading axes.
    """

    borders: jax.Array

    @classmethod
    def create(cls, borders) -> "BarDistribution":
        borders = jnp.asarray(borders, dtype=jnp.float32)
        if borders.ndim != 1:
            raise ValueError("borders must be 1-D (sorted)")
        return cls(borders=borders)

    # ---- derived quantities ------------------------------------------------
    @property
    def num_bars(self) -> int:
        return self.borders.shape[0] - 1

    @property
    def bucket_widths(self) -> jax.Array:
        return self.borders[1:] - self.borders[:-1]

    @property
    def bucket_means(self) -> jax.Array:
        return self.borders[:-1] + self.bucket_widths / 2

    # ---- bucket mapping ----------------------------------------------------
    def map_to_bucket_idx(self, y: jax.Array) -> jax.Array:
        """Index of the bucket containing y; border values land in the lower
        bucket, the two support endpoints land in the end buckets.

        Parity: bar_distribution.py:19-23 (torch.searchsorted 'left' minus 1).
        """
        idx = jnp.searchsorted(self.borders, y, side="left").astype(jnp.int32) - 1
        idx = jnp.where(y == self.borders[0], 0, idx)
        idx = jnp.where(y == self.borders[-1], self.num_bars - 1, idx)
        return idx

    # ---- loss ----------------------------------------------------------------
    def _bucket_log_probs(self, logits: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(logits, axis=-1) - jnp.log(self.bucket_widths)

    def nll(self, logits: jax.Array, y: jax.Array) -> jax.Array:
        """Negative log density of y under the piecewise-constant density.

        ``logits``: (..., num_bars); ``y``: (...). Returns (...).
        Parity: BarDistribution.forward (bar_distribution.py:25-33). Targets
        outside the support are clamped to the end buckets (the reference
        asserts instead, bar_distribution.py:27-28); under
        :func:`pfn_tpu.utils.profiling.pfn_debug_checks` they instead poison
        the NLL with NaN so jax_debug_nans raises at this op.
        """
        idx = jnp.clip(self.map_to_bucket_idx(y), 0, self.num_bars - 1)
        log_probs = self._bucket_log_probs(logits)
        picked = jnp.take_along_axis(log_probs, idx[..., None], axis=-1)[..., 0]
        from pfn_tpu.utils.profiling import debug_checks_enabled

        if debug_checks_enabled():  # trace-time flag; see pfn_debug_checks
            with jax.named_scope("bar_target_support_check"):
                picked = jnp.where(self.check_support(y), picked, jnp.nan)
        return -picked

    def __call__(self, logits: jax.Array, y: jax.Array) -> jax.Array:
        return self.nll(logits, y)

    def check_support(self, y: jax.Array) -> jax.Array:
        """Boolean array: is y strictly inside the modeled support?"""
        return (y >= self.borders[0]) & (y <= self.borders[-1])

    # ---- posterior summaries -------------------------------------------------
    def mean(self, logits: jax.Array) -> jax.Array:
        """E[y]; parity: bar_distribution.py:35-38."""
        p = jax.nn.softmax(logits, axis=-1)
        return p @ self.bucket_means

    def mode(self, logits: jax.Array) -> jax.Array:
        """Center of the highest-logit bucket; parity: bar_distribution.py:64-67."""
        return self.bucket_means[jnp.argmax(logits, axis=-1)]

    def cdf(self, logits: jax.Array, y: jax.Array) -> jax.Array:
        """P(Y <= y); piecewise-linear within buckets. (New summary; the
        reference exposes only quantile/mean/mode/ei.)"""
        p = jax.nn.softmax(logits, axis=-1)
        cum = jnp.cumsum(p, axis=-1)
        idx = jnp.clip(self.map_to_bucket_idx(y), 0, self.num_bars - 1)
        left = jnp.take(self.borders, idx)
        width = jnp.take(self.bucket_widths, idx)
        p_in = jnp.take_along_axis(p, idx[..., None], axis=-1)[..., 0]
        cum_before = jnp.take_along_axis(cum, idx[..., None], axis=-1)[..., 0] - p_in
        frac = jnp.clip((y - left) / width, 0.0, 1.0)
        out = cum_before + frac * p_in
        out = jnp.where(y < self.borders[0], 0.0, out)
        out = jnp.where(y > self.borders[-1], 1.0, out)
        return out

    def icdf(self, logits: jax.Array, q) -> jax.Array:
        """Quantile function: smallest y with CDF(y) >= q, linearly
        interpolated inside the bucket (matches the reference's
        ``find_lower_quantile`` interpolation, bar_distribution.py:49-55)."""
        q = jnp.asarray(q)
        p = jax.nn.softmax(logits, axis=-1)
        cum = jnp.cumsum(p, axis=-1)

        def one(row_p, row_cum, qq):
            idx = jnp.clip(
                jnp.searchsorted(row_cum, qq, side="left"), 0, self.num_bars - 1
            )
            left_prob = jnp.where(idx > 0, row_cum[jnp.maximum(idx - 1, 0)], 0.0)
            rest = qq - left_prob
            lo = self.borders[idx]
            width = self.bucket_widths[idx]
            frac = jnp.where(row_p[idx] > 0, rest / row_p[idx], 0.0)
            return lo + width * jnp.clip(frac, 0.0, 1.0)

        flat_logits = p.reshape(-1, self.num_bars)
        flat_cum = cum.reshape(-1, self.num_bars)
        qb = jnp.broadcast_to(q, logits.shape[:-1]).reshape(-1)
        out = jax.vmap(one)(flat_logits, flat_cum, qb)
        return out.reshape(logits.shape[:-1])

    def quantile(self, logits: jax.Array, center_prob: float = 0.682) -> jax.Array:
        """Central credible interval (lower, upper) with mass center_prob.

        Returns shape ``(*logits.shape[:-1], 2)``.
        Parity: bar_distribution.py:40-62, vectorized.
        """
        side_prob = (1.0 - center_prob) / 2.0
        lower = self.icdf(logits, side_prob)
        upper = self.icdf(logits, 1.0 - side_prob)
        return jnp.stack([lower, upper], axis=-1)

    def ei(self, logits: jax.Array, best_f, maximize: bool = True) -> jax.Array:
        """Expected improvement over best_f for Bayesian optimization.

        Parity: bar_distribution.py:69-80 (each bucket contributes the mean of
        the improved part of the bucket times its probability), vectorized
        over buckets instead of the reference's Python list comprehension.
        ``best_f`` may be a scalar or broadcastable to ``logits.shape[:-1]``.
        """
        best_f = jnp.asarray(best_f)[..., None]  # broadcast over buckets
        lo = self.borders[:-1]
        hi = self.borders[1:]
        if maximize:
            contrib = jnp.maximum((hi + jnp.maximum(lo, best_f)) / 2 - best_f, 0.0)
        else:
            contrib = -jnp.minimum((jnp.minimum(hi, best_f) + lo) / 2 - best_f, 0.0)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.sum(p * contrib, axis=-1)

    # ---- sampling -----------------------------------------------------------
    def sample(self, key: jax.Array, logits: jax.Array) -> jax.Array:
        """Draw y ~ p(y|logits): categorical bucket + uniform within bucket."""
        k1, k2 = jax.random.split(key)
        idx = jax.random.categorical(k1, logits, axis=-1)
        u = jax.random.uniform(k2, idx.shape)
        return jnp.take(self.borders, idx) + u * jnp.take(self.bucket_widths, idx)


@struct.dataclass
class FullSupportBarDistribution(BarDistribution):
    """Bar distribution whose first/last buckets are half-normal tails
    extending the support to all of R.

    Parity: FullSupportBarDistribution (bar_distribution.py:83-117): the tail
    scale is chosen so that half the tail's mass lies within the end bucket's
    width; the NLL of a tail sample is the bucket's log-prob plus the
    half-normal log-density of the distance from the inner border.
    """

    def _tail_scales(self):
        return (
            _halfnormal_scale(self.bucket_widths[0]),
            _halfnormal_scale(self.bucket_widths[-1]),
        )

    def nll(self, logits: jax.Array, y: jax.Array) -> jax.Array:
        idx = jnp.clip(self.map_to_bucket_idx(y), 0, self.num_bars - 1)
        log_probs = self._bucket_log_probs(logits)
        picked = jnp.take_along_axis(log_probs, idx[..., None], axis=-1)[..., 0]
        s0, s1 = self._tail_scales()
        # Tail corrections (bar_distribution.py:104-105): add back log(width)
        # (undoing the density scaling) and the half-normal log pdf of the
        # distance from the inner border.
        corr0 = _halfnormal_logpdf(
            jnp.clip(self.borders[1] - y, min=1e-8), s0
        ) + jnp.log(self.bucket_widths[0])
        corr1 = _halfnormal_logpdf(
            jnp.clip(y - self.borders[-2], min=1e-8), s1
        ) + jnp.log(self.bucket_widths[-1])
        picked = jnp.where(idx == 0, picked + corr0, picked)
        picked = jnp.where(idx == self.num_bars - 1, picked + corr1, picked)
        return -picked

    def mean(self, logits: jax.Array) -> jax.Array:
        s0, s1 = self._tail_scales()
        means = self.bucket_means
        means = means.at[0].set(self.borders[1] - _halfnormal_mean(s0))
        means = means.at[-1].set(self.borders[-2] + _halfnormal_mean(s1))
        p = jax.nn.softmax(logits, axis=-1)
        return p @ means

    def gaussian_cross_entropy(
        self, logits: jax.Array, mu: jax.Array, var: jax.Array
    ) -> jax.Array:
        """Closed-form E_{y~N(mu,var)}[self.nll(logits, y)].

        Rao-Blackwellized Fig-3a gap: the reference scores a SINGLE sampled
        query y per (dataset, context size), so the PFN-vs-oracle gap
        estimator inherits the full sampling variance of that draw (measured:
        ±0.3 nats between 32-dataset draws). When the true posterior
        predictive is Gaussian — as for the exact-GP oracle — the expected
        NLL over the query draw has a closed form, and

            E_D E_{y|D}[nll_PFN - nll_oracle] = E_D[KL(N(mu,var) || bar)]

        so per-dataset ``gaussian_cross_entropy - gaussian_entropy`` is an
        unbiased estimator of the SAME population gap with the query-y noise
        integrated out analytically. No reference equivalent (the reference
        never quantifies its Fig-3a eval noise).

        Derivation: the FullSupport density is p_0·HN(b_1 - y; s0) on
        (-inf, b_1), p_k/w_k on [b_k, b_{k+1}) for inner k, and
        p_{K-1}·HN(y - b_{K-1}; s1) on [b_{K-1}, inf). Inner buckets
        contribute P_k·(log w_k - log p_k) with P_k the Gaussian bucket mass;
        each tail contributes P_tail·(-log p_tail + log s - log sqrt(2/pi))
        + E[D^2·1{D>0}]/(2 s^2) with D the (signed) distance past the inner
        border, using the truncated second moment
        E[D^2·1{D>0}] = (m^2+v)·Phi(m/sd) + m·sd·phi(m/sd) for D~N(m, v).

        ``logits``: (..., num_bars); ``mu``/``var`` broadcastable to (...).
        Computed in the dtype of ``mu`` (pass float64 under x64 for
        many-bucket precision; adjacent-CDF differences cancel in f32 at
        num_bars >~ 1000). Returns (...).
        """
        dtype = jnp.result_type(mu, var)
        borders = self.borders.astype(dtype)
        widths = borders[1:] - borders[:-1]
        lp = jax.nn.log_softmax(logits.astype(dtype), axis=-1)
        mu = jnp.asarray(mu, dtype)
        sd = jnp.sqrt(jnp.asarray(var, dtype))
        sqrt2 = math.sqrt(2.0)

        z = (borders - mu[..., None]) / sd[..., None]  # (..., K+1)
        cdf = 0.5 * (1.0 + jax.scipy.special.erf(z / sqrt2))
        pk = cdf[..., 1:] - cdf[..., :-1]  # (..., K)
        ce = jnp.sum(
            pk[..., 1:-1] * (jnp.log(widths[1:-1]) - lp[..., 1:-1]), axis=-1
        )

        def tail(m, log_p_tail, scale):
            # m: signed distance from the inner border into the tail.
            zz = m / sd
            phi = jnp.exp(-0.5 * zz * zz) / math.sqrt(2.0 * math.pi)
            # Phi via erfc, NOT erf: f32 erf saturates 1 ULP below +-1, and
            # the phantom ~1e-7 tail mass is amplified by the 1/scale^2 of
            # the E[D^2] term into ~1e-2 nats when the end buckets are
            # narrow. erfc underflows to an exact 0.
            big_phi = 0.5 * jax.scipy.special.erfc(-zz / sqrt2)
            e2 = (m * m + sd * sd) * big_phi + m * sd * phi
            return big_phi * (
                -log_p_tail + jnp.log(scale) - _HALF_LOG_2_OVER_PI
            ) + e2 / (2.0 * scale * scale)

        s0, s1 = self._tail_scales()
        ce = ce + tail(borders[1] - mu, lp[..., 0], s0.astype(dtype))
        ce = ce + tail(mu - borders[-2], lp[..., -1], s1.astype(dtype))
        return ce

    def gaussian_kl(
        self, logits: jax.Array, mu: jax.Array, var: jax.Array
    ) -> jax.Array:
        """KL(N(mu, var) || bar(logits)) in closed form (>= 0); see
        :meth:`gaussian_cross_entropy`."""
        dtype = jnp.result_type(mu, var)
        entropy = 0.5 * jnp.log(
            2.0 * math.pi * math.e * jnp.asarray(var, dtype)
        )
        return self.gaussian_cross_entropy(logits, mu, var) - entropy

    def sample(self, key: jax.Array, logits: jax.Array) -> jax.Array:
        """Posterior draw honoring the half-normal tails: edge-bucket
        samples come from the tail distribution (the base class would
        truncate them to the bucket's finite width, biasing e.g. Thompson
        sampling away from extreme y)."""
        k1, k2 = jax.random.split(key)
        idx = jax.random.categorical(k1, logits, axis=-1)
        u = jax.random.uniform(k2, idx.shape, minval=1e-7, maxval=1.0)
        inner = jnp.take(self.borders, idx) + u * jnp.take(
            self.bucket_widths, idx
        )
        # Half-normal inverse CDF: |z| = scale * sqrt(2) * erfinv(u).
        s0, s1 = self._tail_scales()
        dist0 = s0 * jnp.sqrt(2.0) * jax.scipy.special.erfinv(u)
        dist1 = s1 * jnp.sqrt(2.0) * jax.scipy.special.erfinv(u)
        out = jnp.where(idx == 0, self.borders[1] - dist0, inner)
        return jnp.where(idx == self.num_bars - 1, self.borders[-2] + dist1, out)


def get_bucket_limits(
    num_outputs: int,
    full_range: tuple | None = None,
    ys=None,
    verbose: bool = False,
) -> jax.Array:
    """Compute bucket borders: equal-width from a range, or equal-mass
    quantile buckets from a sample of y values.

    Parity: get_bucket_limits (bar_distribution.py:121-143). Host-side numpy;
    returns a jnp array usable to construct a :class:`BarDistribution`.
    """
    assert (ys is not None) or (full_range is not None)
    if ys is not None:
        ys = np.asarray(ys).flatten()
        assert np.isfinite(ys).all(), (
            "non-finite values in the y sample used for bucket estimation — "
            "check the prior's sampler (e.g. GP Cholesky stability at large T)"
        )
        if len(ys) % num_outputs:
            ys = ys[: -(len(ys) % num_outputs)]
        if verbose:
            print(
                f"Using {len(ys)} y evals to estimate {num_outputs} buckets."
            )
        ys_per_bucket = len(ys) // num_outputs
        if full_range is None:
            full_range = (float(ys.min()), float(ys.max()))
        else:
            assert full_range[0] <= ys.min() and full_range[1] >= ys.max()
        ys_sorted = np.sort(ys)
        # Borders between consecutive equal-mass chunks: midpoint between the
        # last element of one chunk and the first of the next.
        bucket_limits = (
            ys_sorted[ys_per_bucket - 1 :: ys_per_bucket][:-1]
            + ys_sorted[ys_per_bucket::ys_per_bucket]
        ) / 2
        bucket_limits = np.concatenate(
            [[full_range[0]], bucket_limits, [full_range[1]]]
        )
        # Repeated y values (min-max-normalized priors emit exact 0/1 spikes)
        # produce duplicate borders = zero-width buckets = -inf log-width in
        # the NLL. Spread duplicates a minimal epsilon apart, monotonically.
        eps = max(1e-6, 1e-7 * (full_range[1] - full_range[0]))
        for i in range(1, len(bucket_limits)):
            if bucket_limits[i] <= bucket_limits[i - 1]:
                bucket_limits[i] = bucket_limits[i - 1] + eps
        full_range = (full_range[0], float(bucket_limits[-1]))
    else:
        class_width = (full_range[1] - full_range[0]) / num_outputs
        bucket_limits = np.concatenate(
            [
                full_range[0] + np.arange(num_outputs) * class_width,
                [full_range[1]],
            ]
        )
    assert len(bucket_limits) - 1 == num_outputs
    assert bucket_limits[0] == full_range[0] and bucket_limits[-1] == full_range[-1]
    return jnp.asarray(bucket_limits, dtype=jnp.float32)

"""BNN / random-MLP prior (the TabPFN-ancestor tabular prior).

Parity target: reference priors/mlp.py:62-203 — per group of
``batch_size_per_sample`` datasets, sample a random MLP whose architecture
and initialization are themselves sampled (depth, width, init std, per-unit
Gaussian noise layers, weight dropout), push Gaussian/uniform "causes"
through it, and read x and y off the network:

  * non-causal mode: x = causes, y = final output (mlp.py:156-158);
  * causal mode: concatenate all hidden activations, y = the last output (or
    a random activation if not ``y_is_effect``), x = a random subset of
    ``num_features_used`` activations (mlp.py:148-155).

Then optionally discretize a sampled subset of features into categorical
(ordinal rank-bins or hashed nominal classes, mlp.py:160-170), z-score x and
y per dataset, optionally binarize y at the median for classification,
rescale by used-feature share, and zero-pad features to ``num_features``
(mlp.py:177-189).

TPU-native design: architecture sampling uses *static* maxima
(``max_layers``/``max_hidden``) with per-group sampled effective depth/width
applied as unit masks over zeroed weights — the function computed equals the
smaller sampled network exactly, every shape is static, and the whole prior
(including meta-randomness) is one jitted, vmapped function. Categorical
discretization likewise uses a static threshold table (F, max_classes) with
a per-feature sampled class-count mask and a fused compare-and-reduce bin count, instead
of the reference's per-feature Python loop over ragged threshold lists.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pfn_tpu.priors.hyper import Constant, HyperSpec, LogUniform, UniformInt
from pfn_tpu.priors.transforms import (
    binarize_by_median,
    normalize_by_used_features,
    normalize_data,
)

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "identity": lambda h: h,
}


@dataclasses.dataclass(frozen=True)
class MLPPrior:
    num_features: int = 1
    num_outputs: int = 1
    # Static architecture bounds (sampled effective depth/width are masked).
    max_layers: int = 6
    max_hidden: int = 128
    # Hyper-hyperparameter specs (defaults mirror priors/mlp.py:23-28).
    num_layers: HyperSpec = UniformInt(3, 6)  # reference asserts > 2 (:111)
    hidden_dim: HyperSpec = UniformInt(16, 128)
    init_std: HyperSpec = LogUniform(0.01, 1.0)
    noise_std: HyperSpec = LogUniform(0.001, 0.3)
    dropout_prob: HyperSpec = Constant(0.0)
    num_features_used: HyperSpec | None = None  # default: all features
    activation: str = "relu"
    sampling: str = "normal"  # 'normal' | 'uniform' causes (mlp.py:132-141)
    is_causal: bool = False
    y_is_effect: bool = True
    pre_sample_causes: bool = False
    pre_sample_weights: bool = False
    is_binary_classification: bool = False
    normalize_by_used_features_flag: bool = True
    batch_size_per_sample: int | None = None
    # Categorical feature discretization (reference mlp.py:47-59,160-170):
    # per group, a scaled-Beta(0.5, 0.8) share of the used features becomes
    # categorical; each such feature is ordinal w.p. 1/2 (rank-bin count kept
    # as the value) else nominal (bin count hashed into the class id).
    categorical_x: bool = False
    max_categorical_classes: int = 10          # nominal cap (mlp.py:51)
    max_categorical_classes_ordinal: int = 200  # ordinal cap (mlp.py:52)

    def _num_causes(self) -> int:
        # Non-causal: causes are the features themselves (mlp.py:102).
        return self.num_features

    def _discretize_categoricals(self, key, x, n_used):
        """Discretize a sampled subset of features (reference mlp.py:160-170).

        Per group: ``num_cat ~ scaled_beta(0.5, 0.8, n_used, 0)`` features
        (a random subset of the used columns) are made categorical. Each has
        ``is_ordinal ~ Bernoulli(1/2)`` and a class count drawn from
        ``scaled_beta(0.1, 2.0, cap, 1)`` with cap 200 (ordinal) / 10
        (nominal), and thresholds ``U(0,1) - 0.5`` against the per-dataset
        z-scored column. The value is the threshold-exceed count (ordinal
        rank bin); nominal features map the count through the reference's
        hash ``count * (127*n + 1) % n``, which is arithmetically
        ``count % n`` since ``127*n + 1 ≡ 1 (mod n)``.

        Static-shape design: a dense (F, max_classes) threshold table with a
        per-feature class-count mask; the bin count is one fused broadcast
        compare-and-reduce over the class axis, so no ragged lists and no
        sequential search in the hot loop.
        """
        _, _, F = x.shape
        kc = jax.random.split(key, 6)
        maxc = self.max_categorical_classes_ordinal

        def scaled_beta(k, a, b, scale, minimum, shape=()):
            # reference priors/utils.py:70: minimum + round(beta*(scale-min+1) - .5)
            u = jax.random.beta(k, a, b, shape)
            return minimum + jnp.clip(
                jnp.floor(u * (scale - minimum + 1)), 0, scale - minimum
            ).astype(jnp.int32)

        num_cat = scaled_beta(kc[0], 0.5, 0.8, n_used, 0)
        # Which features: a uniform ranking over the used columns (mlp.py:161).
        scores = jnp.where(
            jnp.arange(F) < n_used, jax.random.uniform(kc[1], (F,)), jnp.inf
        )
        rank = jnp.argsort(jnp.argsort(scores))
        is_cat = rank < num_cat  # (F,)
        is_ordinal = jax.random.bernoulli(kc[2], 0.5, (F,))
        n_cls = jnp.where(
            is_ordinal,
            scaled_beta(kc[3], 0.1, 2.0, maxc, 1, (F,)),
            scaled_beta(kc[5], 0.1, 2.0, self.max_categorical_classes, 1, (F,)),
        )  # (F,) — ordinal and nominal tables from independent keys, matching
        # the reference's independent draws (mlp.py:164-170)
        thr = jax.random.uniform(kc[4], (F, maxc)) - 0.5
        active = jnp.arange(maxc)[None, :] < n_cls[:, None]
        z = normalize_data(x, axis=1)  # per-dataset seq z-score (mlp.py:163)
        # Vectorized threshold-exceed count (the reference's own formula,
        # mlp.py:166): one broadcast compare + reduce that XLA fuses on the
        # VPU. (searchsorted lowers to a sequential binary-search scan that
        # serializes badly inside the fused train step: 300+ ms/step vs ~1.)
        count = jnp.sum(
            (z[..., None] > thr[None, None]) & active[None, None],
            axis=-1,
            dtype=jnp.int32,
        )  # (G, T, F): #active thresholds strictly below z
        val = jnp.where(is_ordinal, count, count % n_cls).astype(x.dtype)
        return jnp.where(is_cat[None, None, :], val, x)

    def _sample_one_group(self, key: jax.Array, seq_len: int, group_size: int):
        """Sample one random MLP + ``group_size`` datasets pushed through it."""
        ks = jax.random.split(key, 12)
        act = _ACTIVATIONS[self.activation]
        H = self.max_hidden
        L = self.max_layers
        C = self._num_causes()
        F = self.num_features

        depth = jnp.clip(self.num_layers.sample(ks[0]).astype(jnp.int32), 3, L)
        width = jnp.clip(self.hidden_dim.sample(ks[1]).astype(jnp.int32), 1, H)
        init_std = self.init_std.sample(ks[2])
        noise_std = self.noise_std.sample(ks[3])
        dropout_p = self.dropout_prob.sample(ks[4])
        if self.num_features_used is None:
            n_used = jnp.asarray(F, jnp.int32)
        else:
            n_used = jnp.clip(
                self.num_features_used.sample(ks[5]).astype(jnp.int32), 1, F
            )

        unit_mask = (jnp.arange(H) < width).astype(jnp.float32)  # (H,)

        # Weights: input layer (C, H), hidden stack (L-2, H, H), output (H, 1).
        # Init: N(0, init_std/(1-p)) with Bernoulli(1-p) weight dropout, like
        # mlp.py:126-130 (dropout skipped for the first layer there via i>0;
        # we apply it to hidden/output weights only, matching intent).
        def init_w(k, shape, with_dropout):
            p = jnp.where(with_dropout, dropout_p, 0.0)
            w = jax.random.normal(k, shape, dtype=jnp.float32) * (
                init_std / (1.0 - p)
            )
            keep = jax.random.bernoulli(
                jax.random.fold_in(k, 1), 1.0 - p, shape
            ).astype(jnp.float32)
            return w * keep

        w_in = init_w(ks[6], (C, H), False) * unit_mask[None, :]
        b_in = init_w(jax.random.fold_in(ks[6], 2), (H,), False) * unit_mask
        w_hidden = (
            init_w(ks[7], (L - 2, H, H), True)
            * unit_mask[None, :, None]
            * unit_mask[None, None, :]
        )
        b_hidden = init_w(jax.random.fold_in(ks[7], 2), (L - 2, H), True) * unit_mask
        w_out = init_w(ks[8], (H, 1), True) * unit_mask[:, None]
        b_out = init_w(jax.random.fold_in(ks[8], 2), (1,), True)

        # Per-unit noise stds (pre_sample_weights, mlp.py:118).
        if self.pre_sample_weights:
            noise_scales = jnp.abs(
                jax.random.normal(ks[9], (L - 1, H), dtype=jnp.float32) * noise_std
            )
        else:
            noise_scales = jnp.full((L - 1, H), noise_std, dtype=jnp.float32)

        def one_dataset(dkey):
            dk = jax.random.split(dkey, 4)
            if self.sampling == "normal":
                causes = jax.random.normal(dk[0], (seq_len, C), dtype=jnp.float32)
            elif self.sampling == "uniform":
                causes = jax.random.uniform(dk[0], (seq_len, C), dtype=jnp.float32)
            else:
                raise ValueError(f"invalid sampling {self.sampling!r}")

            h = causes @ w_in + b_in  # layer 0
            noise_keys = jax.random.split(dk[1], L - 1)

            def layer(carry, inp):
                h, layer_idx = carry
                w, b, nscale, nkey = inp
                # Hidden layers live at indices 1..depth-2; the output layer
                # is handled separately. Only apply layers below depth-2.
                new_h = act(h) @ w + b
                new_h = new_h + nscale * jax.random.normal(
                    nkey, new_h.shape, dtype=jnp.float32
                )
                is_active = layer_idx < depth - 2
                h = jnp.where(is_active, new_h, h)
                return (h, layer_idx + 1), new_h

            (h, _), hidden_acts = jax.lax.scan(
                layer,
                (h, jnp.asarray(0, jnp.int32)),
                (w_hidden, b_hidden, noise_scales[:-1], noise_keys[:-1]),
            )
            y = (act(h) @ w_out + b_out)[:, 0]
            y = y + noise_scales[-1, 0] * jax.random.normal(
                noise_keys[-1], y.shape, dtype=jnp.float32
            )

            if self.is_causal:
                # Flatten hidden activations (skip the first layer's output,
                # mlp.py:146 outputs[2:]) and draw x columns from the valid
                # (active layer, active unit) positions via masked scores.
                acts = hidden_acts.transpose(1, 0, 2).reshape(seq_len, -1)
                layer_ids = jnp.repeat(jnp.arange(L - 2), H)
                unit_ids = jnp.tile(jnp.arange(H), L - 2)
                valid = (layer_ids < depth - 2) & (unit_ids < width)
                scores = jax.random.uniform(dk[2], (acts.shape[1],))
                scores = jnp.where(valid, scores, jnp.inf)
                feat_idx = jnp.argsort(scores)[:F]  # F smallest = random valid
                x = acts[:, feat_idx]
                if not self.y_is_effect:
                    y_idx = jnp.argmin(
                        jnp.where(valid, jax.random.uniform(dk[3], scores.shape), jnp.inf)
                    )
                    y = acts[:, y_idx]
            else:
                x = causes

            return x, y

        data_keys = jax.random.split(ks[10], group_size)
        x, y = jax.vmap(one_dataset)(data_keys)  # (G,T,F), (G,T)

        # Post-processing (mlp.py:160-189), per dataset over the seq axis.
        if self.categorical_x:
            x = self._discretize_categoricals(ks[11], x, n_used)
        x = normalize_data(x, axis=1)
        y = normalize_data(y[..., None], axis=1)[..., 0]
        if self.is_binary_classification:
            y = binarize_by_median(y, axis=1)
        # Zero features beyond num_features_used, then rescale.
        used_mask = (jnp.arange(F) < n_used).astype(jnp.float32)
        x = x * used_mask
        if self.normalize_by_used_features_flag:
            x = normalize_by_used_features(x, n_used.astype(jnp.float32), F)
        return x, y

    def _check_causal_capacity(self):
        """Causal mode draws x columns from VALID (active-layer, active-unit)
        hidden activations; a network sampled at the spec minima must still
        have >= num_features of them, else inf-scored garbage columns would
        be selected silently."""
        if not self.is_causal:
            return
        min_depth = getattr(self.num_layers, "low", None)
        min_width = getattr(self.hidden_dim, "low", None)
        if isinstance(self.num_layers, Constant):
            min_depth = int(self.num_layers.value)
        if isinstance(self.hidden_dim, Constant):
            min_width = int(self.hidden_dim.value)
        if min_depth is None or min_width is None:
            return  # custom spec without bounds — caller's responsibility
        worst = max(0, (int(min_depth) - 2)) * int(min_width)
        assert worst >= self.num_features, (
            f"causal mode: the smallest sampled network has only {worst} "
            f"hidden activations (< num_features={self.num_features}); raise "
            "num_layers/hidden_dim lower bounds or lower num_features"
        )

    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        from pfn_tpu.priors.base import default_group_size

        self._check_causal_capacity()
        g = self.batch_size_per_sample or default_group_size(batch_size, 8)
        assert batch_size % g == 0
        num_groups = batch_size // g
        group_keys = jax.random.split(key, num_groups)
        x, y = jax.vmap(lambda k: self._sample_one_group(k, seq_len, g))(group_keys)
        x = x.reshape(batch_size, seq_len, self.num_features)
        y = y.reshape(batch_size, seq_len)
        return x, y, y

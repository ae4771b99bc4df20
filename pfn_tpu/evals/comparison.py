"""The PFN-vs-SVI-vs-MCMC comparison harness (Fig-2-style).

Parity: reference mcmc_svi_transformer_on_bayesian.py — the BNN
prior/posterior model (BayesianModel :28-67: linear-linear 2-layer net, N(0,1)
weight priors, x ~ N(0,1), y ~ Categorical(softmax); note there is NO
nonlinearity between the layers in the reference), fixed-seed toy eval data
(:195-207), eval_svi (:211-246), eval_mcmc (:249-267), eval_transformer
(:270-291), the steps/samples sweep drivers with .npy caching (:294-351), and
the CI plotting helpers (:142-192).

TPU-native: SVI and HMC fits are *vmapped over the eval datasets* — the
reference fits 100 independent models in a serial Python loop; here one jit
runs them all batched. The metrics replicate ``evaluate_preds`` (:130-139):
hard predictions per posterior sample, sample-mean as probability, BCE NLL of
that mean, accuracy of thresholding it.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.evals.inference import svi
from pfn_tpu.priors.module import ModulePrior


# ---------------------------------------------------------------------------
# The BNN model (prior + likelihood)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BayesianNNModel:
    """2-layer linear BNN with standard-normal priors (reference :28-67)."""

    num_features: int
    embed: int
    nlayers: int = 2  # the reference spec carries this but builds 2 layers

    def sample_params(self, key):
        k = jax.random.split(key, 4)
        return {
            "w1": jax.random.normal(k[0], (self.num_features, self.embed)),
            "b1": jax.random.normal(k[1], (self.embed,)),
            "w2": jax.random.normal(k[2], (self.embed, 2)),
            "b2": jax.random.normal(k[3], (2,)),
        }

    def logits(self, params, x):
        # Sequential(fc1, fc2) — deliberately no activation (reference :46).
        return (x @ params["w1"] + params["b1"]) @ params["w2"] + params["b2"]

    def generate(self, key, seq_len):
        """One dataset from the prior: x ~ N(0,1), y ~ Cat(softmax(f(x)))."""
        k_p, k_x, k_y = jax.random.split(key, 3)
        params = self.sample_params(k_p)
        x = jax.random.normal(k_x, (seq_len, self.num_features))
        probs = jax.nn.softmax(self.logits(params, x), axis=-1)
        y = jax.random.categorical(k_y, jnp.log(probs), axis=-1)
        return x, y.astype(jnp.float32)

    def log_joint(self, params, x, y):
        log_prior = sum(
            jnp.sum(-0.5 * p**2 - 0.5 * jnp.log(2 * jnp.pi))
            for p in jax.tree_util.tree_leaves(params)
        )
        logp = jax.nn.log_softmax(self.logits(params, x), axis=-1)
        ll = jnp.sum(jnp.take_along_axis(logp, y.astype(jnp.int32)[:, None], 1))
        return log_prior + ll

    def as_prior(self, batch_size_per_model: int | None = None) -> ModulePrior:
        """Expose as a Prior for PFN training (the reference trains via
        priors.pyro.DataLoader on this model, :86-116): the BNN weights are
        drawn from the *model* key (shared within a group), the data from the
        per-dataset key."""

        def sample_fn(model_key, data_key, seq_len):
            params = self.sample_params(model_key)
            k_x, k_y = jax.random.split(data_key)
            x = jax.random.normal(k_x, (seq_len, self.num_features))
            probs = jax.nn.softmax(self.logits(params, x), axis=-1)
            y = jax.random.categorical(k_y, jnp.log(probs), axis=-1)
            return x, y.astype(jnp.float32)

        return ModulePrior(
            sample_fn=sample_fn,
            num_features=self.num_features,
            batch_size_per_model=batch_size_per_model,
        )


def default_model_spec(size: str = "small") -> BayesianNNModel:
    """Parity: get_default_model_spec (:354-370); bptt=300."""
    if size == "big":
        return BayesianNNModel(num_features=8, embed=64)
    if size == "small":
        return BayesianNNModel(num_features=3, embed=5)
    f, e, n = (int(v) for v in size.split("_"))
    return BayesianNNModel(num_features=f, embed=e, nlayers=n)


def generate_toy_data(model: BayesianNNModel, seq_len: int, n_samples: int = 100, seed: int = 0):
    """Fixed-seed eval set (reference :195-207). Returns X (B, T, F), y (B, T)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), n_samples)
    X, y = jax.vmap(lambda k: model.generate(k, seq_len))(keys)
    return X, y


# ---------------------------------------------------------------------------
# Metrics (evaluate_preds parity, :130-139)
# ---------------------------------------------------------------------------

def _evaluate_pred_samples(obs_samples, y_test):
    """obs_samples: (S, T_test) sampled hard labels; y_test: (T_test,)."""
    means = obs_samples.mean(axis=0)
    acc = ((means > 0.5) == (y_test > 0.5)).mean()
    p = jnp.clip(means, 1e-7, 1 - 1e-7)
    nll = -(y_test * jnp.log(p) + (1 - y_test) * jnp.log(1 - p)).mean()
    return acc, nll


# ---------------------------------------------------------------------------
# eval_svi / eval_mcmc / eval_transformer
# ---------------------------------------------------------------------------

def eval_svi(
    X,
    y,
    model: BayesianNNModel,
    training_samples_n: int,
    num_train_steps: int,
    num_pred_samples: int,
    lr: float = 1e-3,
    seed: int = 0,
):
    """SVI posterior per dataset (vmapped), scored on the held-out suffix.

    Parity: reference eval_svi (:211-246) with AutoDiagonalNormal+Trace_ELBO;
    returns (nll (B,), acc (B,))."""
    B = X.shape[0]
    Xtr, ytr = X[:, :training_samples_n], y[:, :training_samples_n]
    Xte, yte = X[:, training_samples_n:], y[:, training_samples_n:]

    def fit_and_eval(xtr, ytr_, xte, yte_, key):
        init = jax.tree.map(
            jnp.zeros_like, model.sample_params(jax.random.PRNGKey(0))
        )
        guide = svi(
            lambda th: model.log_joint(th, xtr, ytr_),
            init,
            key,
            num_steps=num_train_steps,
            lr=lr,
        )
        k_pred, k_obs = jax.random.split(jax.random.fold_in(key, 1))
        thetas = guide.sample(k_pred, num_pred_samples)
        logits = jax.vmap(lambda th: model.logits(th, xte))(thetas)  # (S,T,2)
        probs = jax.nn.softmax(logits, axis=-1)
        obs = jax.random.categorical(k_obs, jnp.log(probs), axis=-1).astype(
            jnp.float32
        )
        return _evaluate_pred_samples(obs, yte_)

    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    acc, nll = jax.vmap(fit_and_eval)(Xtr, ytr, Xte, yte, keys)
    return np.asarray(nll), np.asarray(acc)


def eval_mcmc(
    X,
    y,
    model: BayesianNNModel,
    training_samples_n: int,
    warmup_steps: int,
    num_pred_samples: int,
    seed: int = 0,
):
    """HMC posterior per dataset (vmapped), scored on the held-out suffix.

    Parity: reference eval_mcmc (:249-267) which uses Pyro NUTS; here
    adaptive HMC (see pfn_tpu.evals.inference.hmc)."""
    from pfn_tpu.evals.inference import hmc

    B = X.shape[0]
    Xtr, ytr = X[:, :training_samples_n], y[:, :training_samples_n]
    Xte, yte = X[:, training_samples_n:], y[:, training_samples_n:]

    def fit_and_eval(xtr, ytr_, xte, yte_, key):
        init = jax.tree.map(
            jnp.zeros_like, model.sample_params(jax.random.PRNGKey(0))
        )
        samples, _ = hmc(
            lambda th: model.log_joint(th, xtr, ytr_),
            init,
            key,
            num_samples=num_pred_samples,
            num_warmup=warmup_steps,
            num_leapfrog=15,
        )
        logits = jax.vmap(lambda th: model.logits(th, xte))(samples)
        probs = jax.nn.softmax(logits, axis=-1)
        obs = jax.random.categorical(
            jax.random.fold_in(key, 7), jnp.log(probs), axis=-1
        ).astype(jnp.float32)
        return _evaluate_pred_samples(obs, yte_)

    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    acc, nll = jax.vmap(fit_and_eval)(Xtr, ytr, Xte, yte, keys)
    return np.asarray(nll), np.asarray(acc)


def eval_transformer(X, y, model, params, training_samples_n: int):
    """Amortized inference: ONE forward over all eval points for all datasets
    (reference :270-291). X z-scored by train-prefix stats. Returns
    (acc (B,), nll (B,), elapsed_seconds).

    Known protocol quirk, kept for parity: the ModulePrior the PFN trains on
    z-scores x over the FULL sequence (module.py, like reference
    priors/pyro.py:20-32), while this eval normalizes by the first
    ``training_samples_n`` rows (reference :277-279) — at very small context
    (n=2..10) the prefix stats are noisy and depress the PFN curve relative
    to its training distribution. The reference has the identical skew."""
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    mean = X[:, :training_samples_n].mean(axis=1, keepdims=True)
    std = X[:, :training_samples_n].std(axis=1, keepdims=True) + 1e-6
    Xn = (X - mean) / std
    t0 = time.time()
    pos = jnp.arange(X.shape[1])[None, :]
    y_ctx = jnp.where(pos < training_samples_n, y, 0.0)
    logits = model.apply(params, Xn, y_ctx, training_samples_n)[..., 0]
    logits = jax.block_until_ready(logits)
    elapsed = time.time() - t0
    probs = jax.nn.sigmoid(logits[:, training_samples_n:])
    yte = y[:, training_samples_n:]
    acc = ((probs > 0.5) == (yte > 0.5)).mean(axis=1)
    p = jnp.clip(probs, 1e-7, 1 - 1e-7)
    nll = -(yte * jnp.log(p) + (1 - yte) * jnp.log(1 - p)).mean(axis=1)
    return np.asarray(acc), np.asarray(nll), elapsed


# ---------------------------------------------------------------------------
# Sweep drivers with .npy caching (:294-351)
# ---------------------------------------------------------------------------

def _sweep_cache_tag(X, y, model, extra) -> str:
    """Content hash over the eval data + model spec + sweep parameters —
    the cache key must cover everything that changes the numbers (the
    reference keys only on method+steps, :296-300, a stale-hit hazard when
    rerunning with a different model or dataset)."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.ascontiguousarray(np.asarray(X, np.float32)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(y, np.float32)).tobytes())
    h.update(repr(model).encode())
    h.update(repr(extra).encode())
    return h.hexdigest()[:10]


def training_steps_sweep(
    method: str,
    X,
    y,
    model: BayesianNNModel,
    path_interfix: str,
    steps_grid=(2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096),
    training_samples_n: int = 100,
    overwrite: bool = False,
):
    """Quality-vs-compute sweep over inference steps (reference :294-319)."""
    os.makedirs(path_interfix, exist_ok=True)
    tag = _sweep_cache_tag(X, y, model, training_samples_n)
    results = {}
    for s in steps_grid:
        path = f"{path_interfix}/results_{method}_training_steps_{s}_{tag}.npy"
        if os.path.isfile(path) and not overwrite:
            results[s] = tuple(np.load(path, allow_pickle=True))
            continue
        start = time.time()
        if method == "svi":
            nll, acc = eval_svi(X, y, model, training_samples_n, s, s)
        elif method == "mcmc":
            nll, acc = eval_mcmc(X, y, model, training_samples_n, s, s)
        else:
            raise ValueError(method)
        elapsed = time.time() - start
        np.save(path, np.array((nll, acc, elapsed), dtype=object))
        results[s] = (nll, acc, elapsed)
    return results


def training_samples_sweep(
    method: str,
    X,
    y,
    model: BayesianNNModel,
    evaluation_points,
    path_interfix: str,
    steps: int | None = None,
    overwrite: bool = False,
):
    """Quality-vs-context-size sweep (reference :322-351)."""
    os.makedirs(path_interfix, exist_ok=True)
    steps_ = steps or (1024 if method == "svi" else 512)
    tag = _sweep_cache_tag(X, y, model, steps_)
    results = {}
    for n in evaluation_points:
        path = (
            f"{path_interfix}/results_{method}_{steps_}_"
            f"training_samples_{n}_{tag}.npy"
        )
        if os.path.isfile(path) and not overwrite:
            results[n] = tuple(np.load(path, allow_pickle=True))
            continue
        start = time.time()
        if method == "svi":
            nll, acc = eval_svi(X, y, model, n, steps_, steps_)
        elif method == "mcmc":
            nll, acc = eval_mcmc(X, y, model, n, steps_, steps_)
        else:
            raise ValueError(method)
        elapsed = time.time() - start
        np.save(path, np.array((n, nll, acc, elapsed), dtype=object))
        results[n] = (n, nll, acc, elapsed)
    return results


def default_evaluation_points():
    """Parity: reference :372-373."""
    return list(range(2, 100, 5))


# ---------------------------------------------------------------------------
# Stats / plotting helpers (:142-192)
# ---------------------------------------------------------------------------

def compute_mean_and_conf_interval(values, confidence: float = 0.95):
    import scipy.stats as st

    values = np.asarray(values)
    n = len(values)
    m, se = np.mean(values), st.sem(values)
    h = se * st.t.ppf((1 + confidence) / 2.0, n - 1)
    return m, h


def plot_with_confidence_intervals(ax, x, mean, confidence, **kwargs):
    ax.plot(x, mean, **kwargs)
    kwargs.pop("label", None)
    kwargs.pop("marker", None)
    ax.fill_between(
        x, np.asarray(mean) - confidence, np.asarray(mean) + confidence,
        alpha=0.1, **kwargs,
    )

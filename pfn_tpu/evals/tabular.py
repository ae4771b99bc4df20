"""Tabular benchmark: PFN vs classic baselines on real datasets.

Parity: reference tabular.py — the sliding-window evaluation protocol
(evaluate :160-213, evaluate_dataset :216-228, evaluate_position :231-306):
slice every length-bptt window of the dataset, subsample ``max_samples``
windows with a fixed seed, z-score each window by its stats, score ROC-AUC of
predictions at positions >= eval_position; and the baseline zoo (logistic
:325-346, KNN :350-369, BNN-SVI classifier :373-478, sklearn GP classifier
:481-503, CatBoost :556-596, XGBoost :599-626) each with GridSearchCV.

TPU-native deviations (documented):
  * The PFN branch evaluates ALL queries of a window in ONE forward pass —
    the PFN mask makes per-query and batched evaluation mathematically
    identical (eval tokens don't interact), where the reference loops one
    query at a time (:288-299). ``per_query_norm=True`` reproduces the
    reference's per-query z-scoring (which includes the query row in the
    stats); the default normalizes by the full window like the reference's
    ``mean = eval_x.mean(0)`` over context+query.
  * The BNN baseline's Pyro SVI is replaced by pfn_tpu.evals.inference.svi.
  * XGBoost/CatBoost hooks exist but raise ImportError in environments
    without those packages.
  * ``mean_metric_at_{pos}`` is a valid-window-count-WEIGHTED mean across
    datasets (a dataset with 2 valid windows must not weigh like one with
    40), deviating from the reference's unweighted per-dataset mean
    (tabular.py:209). The reference-parity unweighted statistic is kept
    alongside as ``mean_metric_at_{pos}_unweighted`` / ``mean_metric_unweighted``.
"""

from __future__ import annotations

import functools
import itertools
import os
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

CV = 5


def _roc_auc(y_true, y_score):
    from sklearn.metrics import roc_auc_score

    return roc_auc_score(np.asarray(y_true), np.asarray(y_score))


metric_used = _roc_auc


# ---------------------------------------------------------------------------
# Window construction (evaluate_position :238-277)
# ---------------------------------------------------------------------------

def build_windows(X: np.ndarray, y: np.ndarray, bptt: int, max_samples: int, seed: int = 13):
    """All sliding length-bptt windows, then a seeded subsample of
    ``max_samples`` of them. Returns (windows_X (S, bptt, F), windows_y
    (S, bptt))."""
    # Inclusive of the exactly-fitting window so a len==bptt dataset yields
    # one window (the reference's range(len-bptt) would yield zero,
    # tabular.py:247-251 — a deliberate off-by-one fix).
    num = len(X) - bptt + 1
    assert num > 0, f"dataset too short ({len(X)}) for bptt={bptt}"
    wx = np.stack([X[i : i + bptt] for i in range(num)])
    wy = np.stack([y[i : i + bptt] for i in range(num)])
    sel = np.random.RandomState(seed).permutation(num)[:max_samples]
    return wx[sel], wy[sel]


# ---------------------------------------------------------------------------
# PFN branch
# ---------------------------------------------------------------------------

def evaluate_position_pfn(
    model,
    params,
    X: np.ndarray,
    y: np.ndarray,
    bptt: int,
    eval_position: int,
    max_samples: int = 40,
    rescale_features: float = 1.0,
    num_features: int | None = None,
    ensemble: int = 1,
):
    """ROC-AUC of the PFN at a single eval_position over subsampled windows.

    Windows are z-scored by CONTEXT-prefix stats — the same preprocessing
    batch_pred applies to the baselines, so the benchmark compares models,
    not normalizations. (Deviation note: the reference normalizes the PFN's
    input by context+current-query stats, tabular.py:293-296, while its
    baselines use context-only, :314-317 — one inconsistent row; we use
    context-only for both.) Features are optionally rescaled and zero-padded
    to the model's num_features (tabular.py:182-184).

    ``ensemble > 1`` averages predicted probabilities over that many
    input-symmetry variants — random feature-column permutations, plus a
    binary label flip on alternating members (probabilities flipped back) —
    in ONE batched forward over all members. The MLP prior is exchangeable
    over features and classes, so members are equally valid views; averaging
    integrates out the trained model's residual sensitivity to them. The
    reference evaluates a single view (tabular.py:628-634); TabPFN-style
    ensembling is the standard cheap upgrade. Returns
    (per_window_auc, outputs, ys)."""
    wx, wy = build_windows(X, y, bptt, max_samples)
    mean = wx[:, :eval_position].mean(axis=1, keepdims=True)
    std = wx[:, :eval_position].std(axis=1, keepdims=True) + 1e-6
    wx = (wx - mean) / std
    wx = wx / rescale_features
    F_real = wx.shape[-1]
    if num_features is not None and wx.shape[-1] < num_features:
        pad = np.zeros((*wx.shape[:2], num_features - wx.shape[-1]), np.float32)
        wx = np.concatenate([wx, pad], -1)

    members_x, members_y, flipped = [], [], []
    rng = np.random.RandomState(1234)
    for e in range(max(1, ensemble)):
        xe = wx
        if e > 0:
            perm = rng.permutation(F_real)
            xe = np.concatenate([wx[..., perm], wx[..., F_real:]], -1)
        flip = e % 2 == 1
        members_x.append(xe)
        members_y.append(1.0 - wy if flip else wy)
        flipped.append(flip)

    B = wx.shape[0]
    logits = model.apply(
        params,
        jnp.asarray(np.concatenate(members_x, 0)),
        jnp.where(
            jnp.arange(bptt)[None, :] < eval_position,
            jnp.asarray(np.concatenate(members_y, 0)),
            0.0,
        ),
        eval_position,
    )
    p = np.array(jax.nn.sigmoid(logits[..., 0])).reshape(len(members_x), B, bptt)
    for e, flip in enumerate(flipped):
        if flip:
            p[e] = 1.0 - p[e]
    probs = p.mean(axis=0)[:, eval_position:]
    ys = wy[:, eval_position:]
    aucs = []
    for i in range(len(wx)):
        if len(np.unique(ys[i])) < 2:
            continue
        aucs.append(metric_used(ys[i], probs[i]))
    return np.asarray(aucs), probs, ys


# ---------------------------------------------------------------------------
# Baseline zoo — each (x, y, test_x, test_y, cat_feats) -> (metric, pred)
# ---------------------------------------------------------------------------

def logistic_metric(x, y, test_x, test_y, cat_features):
    """GridSearchCV'd LogisticRegression (tabular.py:325-346)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import GridSearchCV

    grid = {
        "solver": ["saga"],
        "penalty": ["l1", "l2", None],
        "tol": [1e-2, 1e-4, 1e-10],
        "max_iter": [500],
        "fit_intercept": [True, False],
        "C": [1e-5, 0.001, 0.01, 0.1, 1.0, 2.0],
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        clf = GridSearchCV(LogisticRegression(), grid, cv=max(2, min(CV, len(x) // 2)))
        clf.fit(x, y.astype(int))
        pred = clf.predict_proba(test_x)[:, 1]
    return metric_used(test_y, pred), pred


def knn_metric(x, y, test_x, test_y, cat_features):
    """GridSearchCV'd KNN (tabular.py:350-369)."""
    from sklearn import neighbors
    from sklearn.model_selection import GridSearchCV

    grid = {"n_neighbors": np.arange(1, max(2, min(6, len(y) - 1)))}
    clf = GridSearchCV(neighbors.KNeighborsClassifier(), grid, cv=max(2, min(CV, len(x) // 2)))
    clf.fit(x, y.astype(int))
    pred = clf.predict_proba(test_x)[:, 1]
    return metric_used(test_y, pred), pred


def gp_metric(x, y, test_x, test_y, cat_features):
    """GridSearchCV'd sklearn GP classifier over y_scale x length_scale RBF
    kernels (tabular.py:481-503)."""
    from sklearn.gaussian_process import GaussianProcessClassifier
    from sklearn.gaussian_process.kernels import RBF
    from sklearn.model_selection import GridSearchCV

    params_y_scale = [0.05, 0.1, 0.5, 1.0, 5.0, 10.0]
    params_length_scale = [0.1, 0.5, 1.0, 2.0]
    grid = {
        "kernel": [
            s * RBF(l)
            for s, l in itertools.product(params_y_scale, params_length_scale)
        ]
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        clf = GridSearchCV(GaussianProcessClassifier(), grid, cv=max(2, min(CV, len(x) // 2)))
        clf.fit(x, y.astype(int))
        pred = clf.predict_proba(test_x)[:, 1]
    return metric_used(test_y, pred), pred


@functools.lru_cache(maxsize=16)
def _bnn_svi_kernels(F: int, E: int, lr: float, num_steps: int,
                     num_pred_samples: int):
    """Jitted (fit, predict) pair for the BNN-SVI baseline, cached on the
    static configuration.

    Building fresh closures per window defeats jit caching entirely (the
    cache is keyed on function identity), so a benchmark sweep used to
    compile a full num_steps-long SVI scan for EVERY window × config —
    hundreds of large XLA CPU programs that eventually exhausted the LLVM
    JIT's code memory ('Cannot allocate memory'). With data as traced
    arguments there is exactly one compile per (F, E, lr) configuration.
    """
    from pfn_tpu.evals.inference import svi

    def _logits(theta, X):
        h = X @ theta["w1"] + theta["b1"]
        return h @ theta["w2"] + theta["b2"]

    def fit(X, y, key):
        init = {
            "w1": 0.1 * jax.random.normal(key, (F, E)),
            "b1": jnp.zeros(E),
            "w2": 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (E, 2)),
            "b2": jnp.zeros(2),
        }

        def log_joint(theta):
            log_prior = sum(
                jnp.sum(-0.5 * p**2 - 0.5 * jnp.log(2 * jnp.pi))
                for p in jax.tree_util.tree_leaves(theta)
            )
            logits = _logits(theta, X)
            log_lik = jnp.sum(
                jax.nn.log_softmax(logits)[jnp.arange(y.shape[0]), y]
            )
            return log_prior + log_lik

        return svi(log_joint, init, jax.random.fold_in(key, 2),
                   num_steps=num_steps, lr=lr)

    def predict(guide, X, key):
        thetas = guide.sample(key, num_pred_samples)
        probs = jax.vmap(lambda th: jax.nn.softmax(_logits(th, X))[:, 1])(
            thetas
        )
        return probs.mean(axis=0)

    return jax.jit(fit), jax.jit(predict)


class BayesianNNClassifier:
    """2-layer BNN classifier with N(0,1) priors fit by SVI — the JAX
    replacement for the reference's Pyro BayesianNNClassifier
    (tabular.py:414-462). sklearn-like fit/predict_proba API."""

    def __init__(self, num_features, embed=10, lr=1e-3, num_steps=400,
                 num_pred_samples=400, seed=0):
        self.num_features = num_features
        self.embed = embed
        self.lr = lr
        self.num_steps = num_steps
        self.num_pred_samples = num_pred_samples
        self.seed = seed

    def fit(self, X, y):
        X = jnp.asarray(X, jnp.float32)
        y = jnp.asarray(y, jnp.int32)
        F, E = self.num_features, self.embed
        assert X.shape[1] == F, (X.shape, F)
        self._fit_fn, self._pred_fn = _bnn_svi_kernels(
            F, E, self.lr, self.num_steps, self.num_pred_samples
        )
        self.guide_ = self._fit_fn(X, y, jax.random.PRNGKey(self.seed))
        return self

    def predict_proba(self, X):
        X = jnp.asarray(X, jnp.float32)
        return np.asarray(
            self._pred_fn(
                self.guide_, X, jax.random.PRNGKey(self.seed + 100)
            )
        )


def bayes_net_metric(x, y, test_x, test_y, cat_features):
    """BNN-SVI baseline (tabular.py:465-478); small grid over embed/lr."""
    best = None
    for embed in [5, 30]:
        for lr in [1e-3, 1e-4]:
            clf = BayesianNNClassifier(x.shape[1], embed=embed, lr=lr)
            clf.fit(x, y)
            pred = clf.predict_proba(test_x)
            m = metric_used(test_y, pred)
            if best is None or m > best[0]:
                best = (m, pred)
    return best


def xgb_metric(x, y, test_x, test_y, cat_features):
    """XGBoost baseline (tabular.py:599-626); needs the xgboost package."""
    try:
        import xgboost as xgb
    except ImportError as e:
        raise ImportError("xgboost is not installed in this environment") from e
    from sklearn.model_selection import GridSearchCV

    grid = {
        "min_child_weight": [0.5, 1.0],
        "learning_rate": [0.02, 0.2],
        "subsample": [0.5, 0.8],
        "max_depth": [1, 2],
        "colsample_bytree": [0.8],
        "eval_metric": ["logloss"],
        "n_estimators": [100],
    }
    clf = GridSearchCV(xgb.XGBClassifier(), grid, cv=CV)
    clf.fit(x, y.astype(int))
    pred = clf.predict_proba(test_x)[:, 1]
    return metric_used(test_y, pred), pred


def catboost_metric(x, y, test_x, test_y, cat_features):
    """CatBoost baseline (tabular.py:556-596); needs the catboost package."""
    try:
        from catboost import CatBoostClassifier
    except ImportError as e:
        raise ImportError("catboost is not installed in this environment") from e
    model = CatBoostClassifier(loss_function="Logloss", logging_level="Silent")
    model.grid_search(
        {
            "learning_rate": [0.1, 0.5, 1.0],
            "depth": [2, 4, 7],
            "l2_leaf_reg": [0.0, 0.5, 1],
            "iterations": [10, 40, 70],
        },
        X=x, y=y, cv=CV, plot=False, verbose=False,
    )
    pred = model.predict_proba(test_x)[:, 1]
    return metric_used(test_y, pred), pred


def hist_gb_metric(x, y, test_x, test_y, cat_features):
    """Gradient-boosted trees via sklearn's HistGradientBoostingClassifier —
    the hermetic stand-in for the reference's xgboost/catboost columns
    (tabular.py:556-626), which need packages this image doesn't carry.
    Grid mirrors the union of the reference's xgb/catboost grids
    (learning rate x depth x boosting rounds), grid-searched per window
    like every other baseline; min_samples_leaf is included because the
    sklearn default (20) would degenerate to a single leaf on the
    ~30-sample context windows this protocol fits on."""
    from sklearn.ensemble import HistGradientBoostingClassifier
    from sklearn.model_selection import GridSearchCV

    grid = {
        "learning_rate": [0.02, 0.1, 0.5],
        "max_depth": [1, 2, 4],
        "max_iter": [10, 50, 100],
        "min_samples_leaf": [2, 8],
        "early_stopping": [False],
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        clf = GridSearchCV(
            HistGradientBoostingClassifier(),
            grid,
            cv=max(2, min(CV, len(x) // 2)),
        )
        clf.fit(x, y.astype(int))
        pred = clf.predict_proba(test_x)[:, 1]
    return metric_used(test_y, pred), pred


BASELINES = {
    "logistic": logistic_metric,
    "knn": knn_metric,
    "gp": gp_metric,
    "bayes": bayes_net_metric,
    "xgb": xgb_metric,
    "catboost": catboost_metric,
    "hgb": hist_gb_metric,
}


def batch_pred(metric_function, wx, wy, cat_feats, start):
    """Run a baseline per window with window z-scoring (tabular.py:309-323).

    Windows whose query suffix contains a single class are skipped (AUC is
    undefined there) — same guard as the PFN branch; the reference would
    crash inside metric_used instead."""
    metrics, outputs = [], []
    for i in range(len(wx)):
        if len(np.unique(wy[i][start:])) < 2:
            continue
        x = wx[i]
        mean = x[:start].mean(axis=0)
        std = x[:start].std(axis=0) + 1e-6
        x = (x - mean) / std
        m, out = metric_function(x[:start], wy[i][:start], x[start:], wy[i][start:], cat_feats)
        metrics.append(m)
        outputs.append(out)
    return np.asarray(metrics), np.asarray(outputs)


def evaluate_position_baseline(metric_function, X, y, bptt, eval_position,
                               max_samples=40, cat_feats=()):
    wx, wy = build_windows(X, y, bptt, max_samples)
    metrics, outputs = batch_pred(metric_function, wx, wy, list(cat_feats), eval_position)
    return metrics, outputs, wy[:, eval_position:]


# ---------------------------------------------------------------------------
# Top-level sweep with result caching (tabular.py:160-213)
# ---------------------------------------------------------------------------

def evaluate(
    datasets,
    model_or_metric,
    method: str,
    bptt: int,
    eval_positions,
    params=None,
    max_samples: int = 40,
    cache_dir: str | None = None,
    overwrite: bool = False,
    num_features: int | None = None,
    ensemble: int = 1,
):
    """Evaluate a PFN (pass model + params) or a baseline metric fn over a
    dataset list; per-dataset .npy caching like the reference (:168-179).
    Returns a dict with per-dataset and mean metrics."""
    result = {"metric": "auc"}
    # Cache key covers everything that changes the numbers (the reference
    # keys only on method+dataset, tabular.py:168-179 — stale-hit hazard).
    spec = f"bptt{bptt}_pos{'-'.join(map(str, eval_positions))}_n{max_samples}"
    if ensemble > 1:
        spec += f"_e{ensemble}"
    for name, X, y, cat_feats in datasets:
        cache_path = (
            os.path.join(cache_dir, f"results_{method}_{name}_{spec}.npy")
            if cache_dir
            else None
        )
        if cache_path and os.path.isfile(cache_path) and not overwrite:
            result.update(np.load(cache_path, allow_pickle=True).tolist())
            continue
        ds_result = {}
        t0 = time.time()
        for pos in eval_positions:
            if params is not None:
                aucs, outputs, ys = evaluate_position_pfn(
                    model_or_metric, params, X, y, bptt, pos,
                    max_samples=max_samples, num_features=num_features,
                    ensemble=ensemble,
                )
                # Mean of per-window AUCs — the same statistic the baseline
                # branch reports (reference tabular.py:301-306 computes
                # per-window metrics on both paths), so the comparison is
                # apples-to-apples.
                ds_result[f"{name}_mean_metric_at_{pos}"] = float(
                    np.asarray(aucs).mean()
                )
            else:
                aucs, outputs, ys = evaluate_position_baseline(
                    model_or_metric, X, y, bptt, pos,
                    max_samples=max_samples, cat_feats=cat_feats,
                )
                ds_result[f"{name}_mean_metric_at_{pos}"] = float(
                    np.asarray(aucs).mean()
                )
            ds_result[f"{name}_per_ds_metric_at_{pos}"] = np.asarray(aucs)
            # Valid-window count: windows skipped as single-class don't
            # contribute, so datasets weigh by how many windows they scored.
            ds_result[f"{name}_num_windows_at_{pos}"] = int(np.size(aucs))
        ds_result[f"{name}_time"] = time.time() - t0
        if cache_path:
            os.makedirs(cache_dir, exist_ok=True)
            np.save(cache_path, ds_result)  # acts as a resume fixture
        result.update(ds_result)

    for pos in eval_positions:
        # Weight each dataset by its valid-window count (derived from the
        # stored per-window arrays so older caches stay compatible): a
        # dataset with 2 valid windows must not weigh like one with 40.
        counts = np.asarray(
            [np.size(result[f"{d[0]}_per_ds_metric_at_{pos}"]) for d in datasets],
            dtype=np.float64,
        )
        means = np.asarray(
            [result[f"{d[0]}_mean_metric_at_{pos}"] for d in datasets]
        )
        # A dataset with zero valid windows has mean NaN (empty .mean());
        # zero both its weight and its contribution so it truly drops out
        # instead of poisoning the aggregate.
        means = np.where(counts > 0, np.nan_to_num(means), 0.0)
        # No data AT ALL at this position -> NaN (visibly poisoned), not a
        # plausible-looking 0.0 AUC; single empty datasets still drop out.
        result[f"mean_metric_at_{pos}"] = float(
            np.sum(means * counts) / np.sum(counts)
            if counts.sum() > 0 else float("nan")
        )
        # Reference-parity statistic: the unweighted per-dataset mean
        # (reference tabular.py:209) so numbers stay directly comparable
        # to reference-protocol results and this repo's pre-weighting runs.
        valid = counts > 0
        result[f"mean_metric_at_{pos}_unweighted"] = float(
            np.mean(means[valid]) if valid.any() else float("nan")
        )
    result["mean_metric"] = float(
        np.mean([result[f"mean_metric_at_{pos}"] for pos in eval_positions])
    )
    result["mean_metric_unweighted"] = float(
        np.mean([result[f"mean_metric_at_{pos}_unweighted"] for pos in eval_positions])
    )
    return result

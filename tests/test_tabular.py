"""Tabular benchmark harness tests: window protocol, baselines, PFN branch
(SURVEY.md §3.4)."""

import os

import numpy as np
import pytest

from pfn_tpu.data import (
    class_balance_interleave,
    get_2class_iris,
    get_breast_cancer,
    load_local_benchmark,
)
from pfn_tpu.evals.tabular import (
    build_windows,
    evaluate,
    evaluate_position_baseline,
    evaluate_position_pfn,
    hist_gb_metric,
    knn_metric,
    logistic_metric,
)


def test_class_balance_interleave():
    X = np.arange(20, dtype=np.float32).reshape(10, 2)
    y = np.array([0, 0, 0, 0, 0, 0, 0, 1, 1, 1], dtype=np.float32)
    Xb, yb = class_balance_interleave(X, y)
    assert len(yb) == 6  # 2 * minority count
    # Interleaved: alternating classes.
    assert set(np.unique(yb[::2])) != set(np.unique(yb[1::2]))
    assert yb.mean() == 0.5


def test_local_datasets_load():
    for name, X, y, cats in load_local_benchmark():
        assert X.ndim == 2 and len(X) == len(y)
        assert set(np.unique(y)).issubset({0.0, 1.0})
        # Every window is roughly class-balanced thanks to interleaving.
        assert 0.3 < y[:50].mean() < 0.7


def test_build_windows_seeded():
    X, y = get_breast_cancer()
    w1 = build_windows(X, y, bptt=50, max_samples=10)
    w2 = build_windows(X, y, bptt=50, max_samples=10)
    np.testing.assert_array_equal(w1[0], w2[0])
    assert w1[0].shape == (10, 50, X.shape[1])


def test_baseline_knn_beats_chance():
    X, y = get_2class_iris()
    metrics, outputs, ys = evaluate_position_baseline(
        knn_metric, X, y, bptt=60, eval_position=30, max_samples=5
    )
    assert metrics.mean() > 0.8  # iris is easy


def test_baseline_hist_gb_beats_chance():
    """The hermetic boosting stand-in (xgb/catboost columns, reference
    tabular.py:556-626) must be a real learner on the window protocol."""
    X, y = get_2class_iris()
    metrics, _, _ = evaluate_position_baseline(
        hist_gb_metric, X, y, bptt=60, eval_position=30, max_samples=3
    )
    assert metrics.mean() > 0.8


def test_baseline_logistic_beats_chance():
    X, y = get_2class_iris()
    metrics, _, _ = evaluate_position_baseline(
        logistic_metric, X, y, bptt=60, eval_position=30, max_samples=3
    )
    assert metrics.mean() > 0.8


@pytest.fixture(scope="module")
def tiny_tabular_pfn():
    """A small PFN trained briefly on the binarized-GP classification prior
    with a BCE head — the tabular-model recipe at toy scale."""
    from pfn_tpu.priors.binarize import binarized_gp_prior
    from pfn_tpu.train import TrainConfig, bce_criterion, train
    import dataclasses

    prior = binarized_gp_prior(num_features=4, lengthscale=0.5, outputscale=2.0)
    prior = dataclasses.replace(prior, num_outputs=1)  # BCE head is 1-wide
    cfg = TrainConfig(
        emsize=32, nhid=64, nlayers=2, nhead=4, epochs=3, steps_per_epoch=16,
        batch_size=32, bptt=60, lr=1e-3, warmup_epochs=1,
        eval_pos_sampler="uniform", verbose=False, attention_impl="dense",
    )
    res = train(prior, bce_criterion(), cfg)
    return res


def test_pfn_tabular_branch_runs(tiny_tabular_pfn):
    res = tiny_tabular_pfn
    X, y = get_2class_iris()
    aucs, outputs, ys = evaluate_position_pfn(
        res.model, res.params, X, y, bptt=60, eval_position=30,
        max_samples=8, num_features=4,
    )
    assert np.isfinite(outputs).all()
    assert ((0 <= outputs) & (outputs <= 1)).all()
    assert len(aucs) > 0


def test_evaluate_sweep_with_cache(tiny_tabular_pfn, tmp_path):
    res = tiny_tabular_pfn
    datasets = load_local_benchmark(max_samples=120)[:1]
    out = evaluate(
        datasets, res.model, "pfn", bptt=60, eval_positions=[30],
        params=res.params, max_samples=4, cache_dir=str(tmp_path),
        num_features=4,
    )
    assert "mean_metric" in out and np.isfinite(out["mean_metric"])
    # Cache file created; second call loads it.
    out2 = evaluate(
        datasets, res.model, "pfn", bptt=60, eval_positions=[30],
        params=res.params, max_samples=4, cache_dir=str(tmp_path),
        num_features=4,
    )
    assert out2["mean_metric_at_30"] == out["mean_metric_at_30"]


def test_svmlight_loader(tmp_path):
    """Parity: the svmlight loader (reference datasets/__init__.py:8-16)."""
    from sklearn.datasets import dump_svmlight_file

    from pfn_tpu.data.datasets import load_svmlight

    rng = np.random.RandomState(0)
    X = rng.randn(50, 4)
    y = np.concatenate([np.full(30, -1.0), np.full(20, 1.0)])
    path = str(tmp_path / "d.svm")
    dump_svmlight_file(X, y, path)
    Xb, yb = load_svmlight(path)
    # Balanced to 2x minority and interleaved.
    assert len(yb) == 40 and yb.sum() == 20
    assert set(np.unique(yb)) == {0.0, 1.0}
    assert Xb.shape == (40, 4)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/datasets"),
    reason="reference bundled datasets not present",
)
def test_reference_benchmark_loads_all_nine():
    from pfn_tpu.data import load_reference_benchmark

    rows = load_reference_benchmark("/root/reference/datasets")
    names = [r[0] for r in rows]
    assert names == [
        "a1a", "australian", "diabetes", "fourclass", "german.numer",
        "ionosphere_scale", "splice", "heart", "biochem",
    ]
    for name, X, y, cats in rows:
        assert X.ndim == 2 and len(X) == len(y) and len(X) <= 400
        assert np.isfinite(X).all(), name
        assert abs(float(y.mean()) - 0.5) < 1e-6, f"{name} not balanced"


def test_evaluate_weights_by_valid_window_count():
    """The cross-dataset mean weighs each dataset by its valid-window count
    (a 1-window dataset must not count like a 3-window one)."""
    from pfn_tpu.evals import tabular as tab

    rng = np.random.default_rng(0)
    # A: long enough for several bptt=20 windows; B: exactly one.
    A = ["A", rng.normal(size=(60, 3)).astype(np.float32),
         (rng.random(60) > 0.5).astype(np.float32), []]
    B = ["B", rng.normal(size=(20, 3)).astype(np.float32),
         (rng.random(20) > 0.5).astype(np.float32), []]

    def const(v):
        return lambda x, y, tx, ty, cats: (v, np.zeros(len(ty)))

    na = tab.evaluate([A], const(0.8), "m", 20, [10], max_samples=5)[
        "A_num_windows_at_10"
    ]
    nb = tab.evaluate([B], const(0.2), "m", 20, [10], max_samples=5)[
        "B_num_windows_at_10"
    ]
    assert na > nb >= 1

    # evaluate() iterates datasets then windows in order, so a queue of
    # per-call values pins dataset A at 0.8 and B at 0.2.
    vals = iter([0.8] * na + [0.2] * nb)
    res = tab.evaluate(
        [A, B],
        lambda x, y, tx, ty, cats: (next(vals), np.zeros(len(ty))),
        "m2", 20, [10], max_samples=5,
    )
    weighted = (0.8 * na + 0.2 * nb) / (na + nb)
    assert res["mean_metric_at_10"] == pytest.approx(weighted)
    assert weighted != pytest.approx((0.8 + 0.2) / 2)


def test_bnn_svi_classifier_learns_and_caches_compiles():
    """BayesianNNClassifier separates a linear toy AND two instances with the
    same configuration share one jitted (fit, predict) pair — the per-window
    closure rebuild used to force a full SVI-scan recompile every window."""
    import numpy as np

    from pfn_tpu.evals.tabular import BayesianNNClassifier, metric_used

    rng = np.random.default_rng(0)
    X = rng.normal(size=(60, 3)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.int64)
    Xt = rng.normal(size=(40, 3)).astype(np.float32)
    yt = (Xt[:, 0] + 0.5 * Xt[:, 1] > 0).astype(np.int64)

    a = BayesianNNClassifier(3, embed=5, num_steps=150).fit(X, y)
    auc = metric_used(yt, a.predict_proba(Xt))
    assert auc > 0.9, auc

    b = BayesianNNClassifier(3, embed=5, num_steps=150).fit(X, y)
    assert a._fit_fn is b._fit_fn and a._pred_fn is b._pred_fn
    np.testing.assert_allclose(
        a.predict_proba(Xt), b.predict_proba(Xt), rtol=1e-6
    )


def test_pfn_ensemble_predictions(tiny_tabular_pfn):
    """ensemble>1: one batched forward over symmetry variants; probabilities
    stay valid, ensemble-of-1 equals the plain path, and a label-flipped
    member is mapped back (probs differ from the single view but remain
    finite and bounded)."""
    res = tiny_tabular_pfn
    X, y = get_2class_iris()
    kw = dict(bptt=60, eval_position=30, max_samples=6, num_features=4)
    aucs1, p1, _ = evaluate_position_pfn(res.model, res.params, X, y, **kw)
    aucs1b, p1b, _ = evaluate_position_pfn(
        res.model, res.params, X, y, ensemble=1, **kw
    )
    np.testing.assert_allclose(p1, p1b, atol=1e-6)
    aucs4, p4, _ = evaluate_position_pfn(
        res.model, res.params, X, y, ensemble=4, **kw
    )
    assert p4.shape == p1.shape
    assert ((0 <= p4) & (p4 <= 1)).all()
    assert len(aucs4) == len(aucs1)
    # The ensemble is a genuine average over distinct views.
    assert not np.allclose(p4, p1, atol=1e-6)

"""Measure the hermetic boosting baseline (hgb = sklearn
HistGradientBoostingClassifier) across the reference tabular suite.

Closes the "vs tuned boosting" comparison the reference paper headlines
(tabular.py:556-626 xgb/catboost) in an image without those packages:
same window protocol, same per-window grid search, same per-window
z-scoring as every other baseline column. Pure CPU/sklearn — no chip.

Writes docs/results/tabular_hgb_reference_suite.json merging the new hgb
column with the committed PFN/logistic/knn/gp columns from
docs/results/tabular_reference_suite.json so the full comparison lives in
one artifact.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bptt", type=int, default=100)
    p.add_argument("--eval_position", type=int, default=30)
    p.add_argument("--max_samples", type=int, default=20)
    p.add_argument("--ref_root", default="/root/reference/datasets")
    p.add_argument("--out", default="docs/results/tabular_hgb_reference_suite.json")
    p.add_argument("--cache_dir", default="results/tabular_hgb_cache")
    args = p.parse_args()

    # Pure-sklearn baseline: keep jax off the chip (the chip belongs to the
    # round's training chain; shell env cannot override the pinned platform).
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pfn_tpu.data import load_local_benchmark, load_reference_benchmark
    from pfn_tpu.evals.tabular import evaluate, hist_gb_metric

    # Same 12-dataset suite as the committed tabular_reference_suite.json
    # (suite="both"): the reference's bundled svmlight/CSV files plus the
    # hermetic sklearn trio.
    datasets = load_reference_benchmark(args.ref_root, max_samples=400)
    datasets += load_local_benchmark(max_samples=400)
    print(f"datasets: {[d[0] for d in datasets]}", flush=True)

    res = evaluate(
        datasets, hist_gb_metric, method="hgb", bptt=args.bptt,
        eval_positions=[args.eval_position], max_samples=args.max_samples,
        cache_dir=args.cache_dir,
    )
    pos = args.eval_position
    hgb = {
        d[0]: round(float(res[f"{d[0]}_mean_metric_at_{pos}"]), 4)
        for d in datasets
    }
    hgb["_windows"] = {
        d[0]: int(res[f"{d[0]}_num_windows_at_{pos}"]) for d in datasets
    }
    counts = np.asarray([hgb["_windows"][d[0]] for d in datasets], float)
    means = np.asarray([hgb[d[0]] for d in datasets], float)
    hgb_weighted = float((counts * means).sum() / counts.sum())

    out = {
        "protocol": (
            f"bptt={args.bptt}, eval_position={pos}, <=400 rows "
            f"class-balanced, {args.max_samples} windows/dataset, per-window "
            "ROC-AUC; hgb = sklearn HistGradientBoostingClassifier "
            "grid-searched per window (learning_rate x max_depth x max_iter "
            "x min_samples_leaf, 5-fold) — the hermetic stand-in for the "
            "reference's xgboost/catboost columns (tabular.py:556-626)"
        ),
        "hgb": hgb,
        "hgb_weighted_mean": round(hgb_weighted, 4),
    }

    base_path = "docs/results/tabular_reference_suite.json"
    if os.path.isfile(base_path):
        with open(base_path) as f:
            base = json.load(f)
        out["other_columns_from"] = base_path
        out["weighted_mean"] = dict(base.get("weighted_mean", {}))
        out["weighted_mean"]["hgb"] = round(hgb_weighted, 4)
        for col in ("pfn", "logistic", "knn", "gp"):
            if col in base:
                out[col] = base[col]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"hgb_weighted_mean": hgb_weighted,
                      "per_dataset": {k: v for k, v in hgb.items()
                                      if k != "_windows"}}), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()

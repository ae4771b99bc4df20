"""Tabular PFN vs classical baselines on real datasets.

Parity: reference notebooks/TabularEvalSimple.ipynb + tabular.py §main — train
(or load) a classification PFN on a synthetic tabular prior, then score
ROC-AUC at eval_position=30 over bptt=100 windows against the baseline zoo
(logistic, KNN, GP classifier, Bayesian-NN SVI, XGBoost, CatBoost —
tabular.py:325-626). The reference's protocol: 60 padded features, <=400
class-balanced rows per dataset (tabular.py:628-634).

Dataset source: OpenML when importable+cached (reference datasets lists), else
the hermetic sklearn-bundled suite (pfn_tpu.data.load_local_benchmark).

Usage:
    python experiments/tabular_eval.py --quick
    python experiments/tabular_eval.py --prior mlp --epochs 100
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--quick", action="store_true")
    p.add_argument(
        "--prior", default="mlp",
        choices=["mlp", "binarized_gp", "mlp_gp_mixture"],
    )
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--bptt", type=int, default=100)
    p.add_argument("--eval_positions", type=int, nargs="+", default=[30])
    p.add_argument("--num_features", type=int, default=None)
    p.add_argument("--max_samples", type=int, default=20)
    p.add_argument("--baselines", nargs="+",
                   default=["logistic", "knn", "xgb"],
                   help="subset of: logistic knn gp bayes_net xgb catboost "
                        "hgb (hgb = hermetic HistGradientBoosting stand-in "
                        "for the xgb/catboost columns)")
    p.add_argument("--out", default="results/tabular")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--load", default=None, help="skip training, load params")
    p.add_argument(
        "--checkpoint_dir", default=None,
        help="full-state checkpoint/resume dir for the meta-training phase "
             "(train() auto-resumes from the newest checkpoint, so long "
             "epoch budgets can run in bounded slots like fig3a_longrun)",
    )
    p.add_argument("--checkpoint_every", type=int, default=50)
    p.add_argument(
        "--suite", default="auto", choices=["auto", "reference", "sklearn", "both"],
        help="dataset suite: the reference's bundled svmlight/CSV files "
             "(where baselines actually spread out), the hermetic sklearn "
             "suite, or both; auto = reference when present else sklearn",
    )
    p.add_argument(
        "--ref_root", default="/root/reference/datasets",
        help="directory with the reference's bundled dataset files",
    )
    p.add_argument(
        "--ensemble", type=int, default=1,
        help="PFN inference-time ensemble size: feature permutations + "
             "label flips, probabilities averaged (1 = reference protocol)",
    )
    p.add_argument(
        "--no_categorical", action="store_true",
        help="disable categorical feature discretization in the MLP prior",
    )
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pfn_tpu.data import load_local_benchmark, load_reference_benchmark
    from pfn_tpu.evals import tabular as tab
    from pfn_tpu.train import TrainConfig, bce_criterion, train

    suite = args.suite
    if suite == "auto":
        suite = "reference" if os.path.isdir(args.ref_root) else "sklearn"
    datasets = []
    if suite in ("reference", "both"):
        datasets += load_reference_benchmark(args.ref_root, max_samples=400)
    if suite in ("sklearn", "both"):
        datasets += load_local_benchmark(max_samples=400)
    print(f"suite={suite}: {[d[0] for d in datasets]}")
    # Model feature width: reference uses 60 padded features; the hermetic
    # suite's widest dataset works too.
    data_width = max(d[1].shape[1] for d in datasets)
    num_features = args.num_features or max(data_width, 30 if args.quick else 60)

    if args.prior in ("mlp", "mlp_gp_mixture"):
        from pfn_tpu.priors.mlp import MLPPrior

        from pfn_tpu.priors.hyper import UniformInt

        # num_features_used sampled per group like the reference's tabular
        # hyperparameter pack (tabular.py:47-70): real datasets of any width
        # <= num_features are then in-distribution after zero-padding +
        # used-features rescaling.
        prior = MLPPrior(
            num_features=num_features, is_binary_classification=True,
            is_causal=False, categorical_x=not args.no_categorical,
            num_features_used=UniformInt(1, num_features + 1),
        )
        if args.prior == "mlp_gp_mixture":
            # Prior-diversity A/B (round-4 scaling verdict: the tabular gap
            # is prior-limited): blend 20% binarized GP-hyperprior datasets
            # (Matern-5/2 ARD, Gamma hypers — smooth non-MLP functions) into
            # the MLP meta-training stream. Static batch split, same model,
            # same schedule, same eval protocol as --prior mlp.
            from pfn_tpu.priors.binarize import BinarizedPrior
            from pfn_tpu.priors.gp_mix import GPMixPrior
            from pfn_tpu.priors.mixture import BatchMixture

            prior = BatchMixture(
                components=(
                    prior,
                    BinarizedPrior(
                        base=GPMixPrior(num_features=min(8, num_features)),
                        num_outputs=1,
                    ),
                ),
                weights=(0.8, 0.2),
            )
    else:
        from pfn_tpu.priors.binarize import binarized_gp_prior

        prior = binarized_gp_prior(num_features=num_features)

    if args.quick:
        cfg = TrainConfig(
            emsize=64, nhid=128, nlayers=3, nhead=4, bptt=args.bptt,
            batch_size=32, epochs=args.epochs or 20, steps_per_epoch=30,
            lr=1e-3, warmup_epochs=4,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every if args.checkpoint_dir else 0,
        )
    else:
        # TabularEvalSimple.ipynb cells 9-10 scale. attention_impl='best'
        # adopts the committed fused-vs-XLA A/B winner (bench._resolve_impl)
        # on TPU; off-TPU 'auto' stays the resolution.
        impl = "auto"
        if not args.cpu:
            import sys

            sys.path.insert(
                0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            from bench import _resolve_impl

            impl = _resolve_impl("best")
        cfg = TrainConfig(
            emsize=512, nhid=1024, nlayers=6, nhead=4, bptt=args.bptt,
            batch_size=256, epochs=args.epochs or 300, steps_per_epoch=100,
            lr=1e-4, warmup_epochs=25, attention_impl=impl,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every if args.checkpoint_dir else 0,
        )

    from pfn_tpu.train.loop import build_model

    criterion = bce_criterion()
    if args.load:
        import jax

        from pfn_tpu.train.checkpoints import restore_checkpoint

        model = build_model(prior, criterion, cfg)
        template = model.init_params(jax.random.PRNGKey(0), seq_len=cfg.bptt)
        params = restore_checkpoint(args.load, template)
    else:
        result = train(prior, criterion, cfg)
        model, params = result.model, result.params
        print(f"trained: final loss {result.final_loss:.4f}")
        if args.checkpoint:
            from pfn_tpu.train.checkpoints import save_checkpoint

            save_checkpoint(args.checkpoint, params)

    os.makedirs(args.out, exist_ok=True)
    all_results = {}
    # PFN cache lives in a model-tagged subdir: the protocol-level cache key
    # (method+dataset+bptt+positions) cannot see WHICH model produced the
    # numbers, so reruns with a different prior/size/epochs must not hit the
    # old model's results. Baseline caches are model-free by construction.
    pfn_cache = os.path.join(
        args.out,
        f"pfn_{args.prior}_e{cfg.epochs}_em{cfg.emsize}_f{num_features}",
    )
    pfn_res = tab.evaluate(
        datasets, model, "pfn", args.bptt, args.eval_positions, params=params,
        max_samples=args.max_samples, cache_dir=pfn_cache,
        num_features=num_features, ensemble=args.ensemble,
    )
    all_results["pfn"] = pfn_res["mean_metric"]
    print(f"PFN mean AUC: {pfn_res['mean_metric']:.4f}")

    metric_fns = {
        "logistic": tab.logistic_metric,
        "knn": tab.knn_metric,
        "gp": tab.gp_metric,
        "bayes_net": tab.bayes_net_metric,
        "xgb": tab.xgb_metric,
        "catboost": tab.catboost_metric,
    }
    for name in args.baselines:
        try:
            res = tab.evaluate(
                datasets, metric_fns[name], name, args.bptt,
                args.eval_positions, max_samples=args.max_samples,
                cache_dir=args.out,
            )
            all_results[name] = res["mean_metric"]
            print(f"{name} mean AUC: {res['mean_metric']:.4f}")
        except Exception as e:  # e.g. xgboost not installed
            print(f"{name}: skipped ({e})")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(all_results, f, indent=2)
    print(f"wrote {args.out}/summary.json")


if __name__ == "__main__":
    main()

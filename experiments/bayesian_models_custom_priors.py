"""Custom (BNN) prior → PFN training → SVI/MCMC comparison.

Parity: reference notebooks/BayesianModels_And_Custom_Pyro_Modules.ipynb +
mcmc_svi_transformer_on_bayesian.py §main — the Fig-2-style experiment:
  1. define a Bayesian NN prior (the "bring your own prior" API; here a
     :class:`pfn_tpu.evals.comparison.BayesianNNModel`, any other callable
     works through :class:`pfn_tpu.priors.module.ModulePrior`);
  2. meta-train a PFN on datasets sampled from it (reference config: lr
     2.006434e-5, epochs 160/400, emsize 256, batch 256, nlayers 5, nhead 4,
     bptt 300, 100 steps/epoch — mcmc_svi_transformer_on_bayesian.py:70-83);
  3. evaluate PFN vs SVI vs NUTS-MCMC on a fixed-seed toy eval set, with
     .npy-cached sweeps over inference steps and context sizes.

Usage:
    python experiments/bayesian_models_custom_priors.py --quick
    python experiments/bayesian_models_custom_priors.py --size big --epochs 400
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--size", default="small", help="small | big | F_E_N")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--bptt", type=int, default=None)
    p.add_argument("--training_samples", type=int, default=None)
    p.add_argument("--out", default="results/bayesian_models")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--methods", nargs="+", default=["transformer", "svi", "mcmc"])
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from pfn_tpu.evals import comparison
    from pfn_tpu.train import TrainConfig, bce_criterion, train

    spec = comparison.default_model_spec(args.size)
    if args.quick:
        bptt = args.bptt or 60
        cfg = TrainConfig(
            emsize=64, nhid=128, nlayers=3, nhead=4, bptt=bptt,
            batch_size=64, epochs=args.epochs or 30, steps_per_epoch=50,
            lr=1e-3, warmup_epochs=5,
        )
        n_train = args.training_samples or 30
        eval_sets = 20
    else:
        # Reference config (mcmc_svi_transformer_on_bayesian.py:70-83).
        bptt = args.bptt or 300
        cfg = TrainConfig(
            emsize=256, nhid=512, nlayers=5, nhead=4, bptt=bptt,
            batch_size=256, epochs=args.epochs or 160, steps_per_epoch=100,
            lr=2.006434e-5, warmup_epochs=min(20, (args.epochs or 160) // 4),
        )
        n_train = args.training_samples or 100
        eval_sets = 100

    prior = spec.as_prior()
    result = train(prior, bce_criterion(), cfg)
    print(f"PFN trained: final loss {result.final_loss:.4f}")
    if args.checkpoint:
        from pfn_tpu.train.checkpoints import save_checkpoint

        save_checkpoint(args.checkpoint, result.params)

    # Fixed-seed eval set (reference :195-207).
    X, y = comparison.generate_toy_data(spec, bptt, n_samples=eval_sets, seed=0)

    os.makedirs(args.out, exist_ok=True)
    summary = {}
    if "transformer" in args.methods:
        acc, nll, secs = comparison.eval_transformer(
            X, y, result.model, result.params, n_train
        )
        summary["transformer"] = dict(
            acc=float(np.mean(acc)), nll=float(np.mean(nll)), seconds=secs
        )
        print(f"PFN: acc {np.mean(acc):.3f} nll {np.mean(nll):.3f} in {secs:.3f}s")
    steps = 64 if args.quick else 1024
    if "svi" in args.methods:
        nll, acc = comparison.eval_svi(X, y, spec, n_train, steps, steps)
        summary["svi"] = dict(acc=float(np.mean(acc)), nll=float(np.mean(nll)))
        print(f"SVI({steps}): acc {np.mean(acc):.3f} nll {np.mean(nll):.3f}")
    if "mcmc" in args.methods:
        mc = 64 if args.quick else 512
        nll, acc = comparison.eval_mcmc(X, y, spec, n_train, mc, mc)
        summary["mcmc"] = dict(acc=float(np.mean(acc)), nll=float(np.mean(nll)))
        print(f"MCMC({mc}): acc {np.mean(acc):.3f} nll {np.mean(nll):.3f}")

    import json

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {args.out}/summary.json")


if __name__ == "__main__":
    main()

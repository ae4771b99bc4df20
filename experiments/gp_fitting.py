"""Fig-3a pipeline: exact-GP baseline sweep + PFN training + NLL-vs-context.

Parity: reference notebooks/SetupForGPFittingExperiments.ipynb —
  * cell 3 ``bl()``: exact-GP posterior NLL ground truth over context sizes;
  * cell 5: the training grid (full config: bptt=2010, emsize=512, nhead=4,
    nlayers=6, nhid=1024, FullSupportBarDistribution with 1000/10000 buckets
    estimated from 100k sampled ys, batch 4 x aggregate_k_gradients 25,
    weighted eval-pos sampler, no positional encoding, GP hps noise=1e-4,
    outputscale=1.0, lengthscale=0.6);
  * cell 6 ``run_test``: PFN NLL vs eval position, compared to the oracle.

Usage:
    python experiments/gp_fitting.py --quick          # minutes, small model
    python experiments/gp_fitting.py                  # the Fig-3a config
    python experiments/gp_fitting.py --bptt 2010 ...  # override pieces
"""

from __future__ import annotations

import argparse
import json
import os


GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--quick", action="store_true", help="small config, ~2 min on TPU")
    p.add_argument("--bptt", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--num_buckets", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--out", default="results/gp_fitting")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.evals import eval_positional_loss, gp_exact_evaluate
    from pfn_tpu.priors.base import sample_y_for_buckets
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, full_support_bar_criterion, train

    if args.quick:
        bptt = args.bptt or 100
        cfg = TrainConfig(
            emsize=128, nhid=256, nlayers=4, nhead=4, bptt=bptt,
            batch_size=64, epochs=args.epochs or 40, steps_per_epoch=60,
            lr=args.lr or 1e-3, warmup_epochs=5,
            eval_pos_sampler="weighted", updates_per_call=10,
        )
        num_buckets = args.num_buckets or 200
    else:
        # The Fig-3a grid point (ipynb cell 5; epochs there go up to 10000).
        bptt = args.bptt or 2010
        cfg = TrainConfig(
            emsize=512, nhid=1024, nlayers=6, nhead=4, bptt=bptt,
            batch_size=4, aggregate_k_gradients=25,
            epochs=args.epochs or 1250, steps_per_epoch=100,
            lr=args.lr or 1e-4, warmup_epochs=20,
            eval_pos_sampler="weighted", eval_pos_max=min(2000, bptt),
            dtype=jnp.bfloat16,
        )
        num_buckets = args.num_buckets or 1000

    prior = GPPrior(num_features=1, **GP_HP)
    ys = sample_y_for_buckets(prior, 100_000, bptt)  # cell 5: 100k sampled ys
    criterion = full_support_bar_criterion(
        get_bucket_limits(num_buckets, ys=ys)
    )

    print(f"training: bptt={bptt} buckets={num_buckets} epochs={cfg.epochs}")
    result = train(prior, criterion, cfg)

    # --- evaluation: PFN curve vs exact-GP oracle (cells 3 + 6) ------------
    eval_T = min(bptt, 200)
    x, y, target_y = prior.sample(jax.random.PRNGKey(1234), 128, eval_T)
    positions = jnp.arange(1, eval_T, max(1, eval_T // 50))
    pfn_nll, _ = eval_positional_loss(
        result.model, result.params, criterion, x, y, target_y,
        positions=positions,
    )
    _, oracle_nll, secs = gp_exact_evaluate(x, y, GP_HP, start_pos=1)
    oracle_at = oracle_nll[positions - 1]

    os.makedirs(args.out, exist_ok=True)
    out = {
        "positions": positions.tolist(),
        "pfn_nll": np.asarray(pfn_nll).tolist(),
        "oracle_nll": np.asarray(oracle_at).tolist(),
        "final_train_loss": result.final_loss,
        "oracle_seconds": secs,
    }
    with open(os.path.join(args.out, "curves.json"), "w") as f:
        json.dump(out, f, indent=2)

    gap = float(np.mean(np.asarray(pfn_nll) - np.asarray(oracle_at)))
    print(f"mean PFN-minus-oracle NLL gap: {gap:.4f} nats")
    print(f"wrote {args.out}/curves.json")

    if args.checkpoint:
        from pfn_tpu.train.checkpoints import save_checkpoint

        save_checkpoint(args.checkpoint, result.params)
        print(f"saved {args.checkpoint}")


if __name__ == "__main__":
    main()

"""PFN-driven Bayesian optimization vs random search on GP-prior objectives.

The reference ships only a truncated acquisition stub
(acquisition_functions.py:5-16) and the bar-head EI (bar_distribution.py:
69-80) — there is no working BO loop or evaluation anywhere in it. This
driver provides the missing headline evidence: meta-train a GP-prior PFN,
then optimize functions drawn from the SAME prior with one-forward-per-
iteration acquisition scoring, reporting simple regret vs random search.

    python experiments/bayesopt_eval.py --quick [--cpu]

Writes docs/results/bayesopt_<tag>.json and prints a regret table.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


GP_HP = dict(noise=1e-2, outputscale=1.0, lengthscale=0.3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--num_functions", type=int, default=None)
    p.add_argument("--num_candidates", type=int, default=128)
    p.add_argument("--num_iterations", type=int, default=25)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pfn_tpu.bayesopt import PFNOptimizer, optimize
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.ops.gp_sample import gp_sample_paths
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, bar_criterion, train

    quick = args.quick
    epochs = args.epochs or (60 if quick else 400)
    num_fns = args.num_functions or (8 if quick else 32)
    T_bo = args.num_iterations
    num_init = 3
    bptt = max(64, num_init + T_bo + 10)

    prior = GPPrior(num_features=1, **GP_HP)
    crit = bar_criterion(get_bucket_limits(256, full_range=(-4.0, 4.0)))
    cfg = TrainConfig(
        emsize=128 if not quick else 64,
        nhid=256 if not quick else 128,
        nlayers=4 if not quick else 3,
        nhead=4,
        epochs=epochs,
        steps_per_epoch=30,
        batch_size=64,
        bptt=bptt,
        lr=1e-3,
        warmup_epochs=max(2, epochs // 20),
        verbose=False,
        updates_per_call=1 if args.cpu else 10,
    )
    print(f"training surrogate PFN ({epochs} epochs, bptt={bptt})...")
    result = train(prior, crit, cfg)
    print(f"final train loss {result.final_loss:.3f}")

    opt_ei = PFNOptimizer(result.model, result.params, crit.bar, acquisition="ei")
    opt_ucb = PFNOptimizer(
        result.model, result.params, crit.bar, acquisition="ucb", beta=1.5
    )

    M = args.num_candidates
    regrets = {"ei": [], "ucb": [], "random": []}
    for f_idx in range(num_fns):
        key = jax.random.PRNGKey(1000 + f_idx)
        k_fn, k_bo, k_rand = jax.random.split(key, 3)
        # Candidate grid + one GP draw over it = the objective lookup table.
        xs = jnp.linspace(0.0, 1.0, M)[:, None]
        ys = gp_sample_paths(k_fn, xs[None], **GP_HP)[0]  # (M,)
        true_best = float(jnp.max(ys))
        table = np.asarray(ys)

        def objective(x):
            i = int(np.abs(np.asarray(xs[:, 0]) - float(x[0])).argmin())
            return float(table[i])

        for name, opt in (("ei", opt_ei), ("ucb", opt_ucb)):
            _, y_obs = optimize(
                objective, opt, xs, num_iterations=T_bo, key=k_bo,
                num_init=num_init,
            )
            best_so_far = np.maximum.accumulate(np.asarray(y_obs))
            regrets[name].append(true_best - best_so_far[num_init - 1 :])
        # Random-search baseline on the same budget.
        perm = np.asarray(
            jax.random.permutation(k_rand, M)[: num_init + T_bo]
        )
        rnd = np.maximum.accumulate(table[perm])
        regrets["random"].append(true_best - rnd[num_init - 1 :])

    summary = {}
    for name, r in regrets.items():
        arr = np.stack(r)  # (num_fns, T+1)
        summary[name] = {
            "mean_regret": arr.mean(axis=0).tolist(),
            "final_regret": float(arr[:, -1].mean()),
            "iters_to_0.1": float(
                np.mean([np.argmax(row < 0.1) if (row < 0.1).any() else len(row)
                         for row in arr])
            ),
        }

    tag = "quick" if quick else "full"
    out_path = args.out or os.path.join(
        os.path.dirname(__file__), "..", "docs", "results",
        f"bayesopt_{tag}.json",
    )
    payload = {
        "gp_hp": GP_HP, "epochs": epochs, "num_functions": num_fns,
        "num_candidates": M, "num_iterations": T_bo, "num_init": num_init,
        "summary": summary,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_path}")
    print(f"{'iter':>4} {'EI':>8} {'UCB':>8} {'random':>8}")
    for t in range(0, T_bo + 1, max(1, T_bo // 8)):
        print(
            f"{t:4d} {summary['ei']['mean_regret'][t]:8.3f} "
            f"{summary['ucb']['mean_regret'][t]:8.3f} "
            f"{summary['random']['mean_regret'][t]:8.3f}"
        )
    print(
        f"final regret: EI {summary['ei']['final_regret']:.3f} | "
        f"UCB {summary['ucb']['final_regret']:.3f} | "
        f"random {summary['random']['final_regret']:.3f}"
    )


if __name__ == "__main__":
    main()

"""Statistically robust Fig-3a eval of a trained bptt=2010 checkpoint.

Per-position NLL is HEAVY-TAILED across prior draws: with a 32-dataset eval
batch the per-position gap fluctuates by several tenths of a nat between
draws (one hard dataset dominates the mean — measured: ctx=1400 gap read
0.39 on one 32-draw and 0.17 on another). This script evaluates many
chunks of datasets, keeps the full per-dataset loss matrix, and reports
mean, median, and a bootstrap CI of the per-position gap against the
float64 exact-GP oracle — so schedule-to-schedule comparisons are made at
a measured resolution instead of single-draw noise.

Phase A (accelerator): PFN per-dataset positional NLL over --chunks chunks
of --chunk_batch datasets (chunked to bound the Cholesky(T^2) sampling
memory). Phase B (subprocess, float64 CPU — x64 must be enabled before
first jax use): chunked exact-GP oracle at the nominal AND effective noise
(docs/PERF.md "Numerical-fidelity note").

    python experiments/fig3a_robust_eval.py --ck results/fig3a/ck \
        --out results/fig3a/robust_eval
"""

from __future__ import annotations

import argparse
import json
import os

GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
POSITIONS = [1, 2, 5, 10, 20, 50, 100, 200, 400, 700, 1000, 1400, 1800, 2000]


def oracle_pass(out_dir: str, chunk: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from pfn_tpu.evals import gp_exact_evaluate

    data = np.load(os.path.join(out_dir, "eval_data.npz"))
    x, y, positions = data["x"], data["y"], data["positions"]
    per_nominal, per_eff = [], []
    for s in range(0, len(x), chunk):
        # Per-chunk checkpoint files: each f64 chunk is ~7 min of CPU, so a
        # killed run resumes instead of recomputing everything.
        part = os.path.join(out_dir, f"oracle_chunk_{s // chunk:03d}.npz")
        if os.path.exists(part):
            p = np.load(part)
            all_n, all_e = p["nominal"], p["effective"]
        else:
            xb = jnp.asarray(x[s : s + chunk])
            yb = jnp.asarray(y[s : s + chunk])
            all_n, _, _ = gp_exact_evaluate(
                xb, yb, GP_HP, positions=jnp.asarray(positions),
                dtype=jnp.float64,
            )
            all_e, _, _ = gp_exact_evaluate(
                xb, yb, dict(GP_HP, noise=1e-3),
                positions=jnp.asarray(positions), dtype=jnp.float64,
            )
            np.savez(part, nominal=np.asarray(all_n),
                     effective=np.asarray(all_e))
        per_nominal.append(np.asarray(all_n))  # (P, chunk)
        per_eff.append(np.asarray(all_e))
        print(f"oracle chunk {s // chunk + 1} done", flush=True)
    np.savez(
        os.path.join(out_dir, "oracle_per_dataset.npz"),
        nominal=np.concatenate(per_nominal, axis=1),
        effective=np.concatenate(per_eff, axis=1),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ck", default="results/fig3a/ck")
    p.add_argument("--out", default="results/fig3a/robust_eval")
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--chunk_batch", type=int, default=32)
    p.add_argument("--bptt", type=int, default=2010)
    p.add_argument("--num_buckets", type=int, default=1000)
    p.add_argument("--seed", type=int, default=991)
    p.add_argument("--oracle_pass", action="store_true")
    p.add_argument("--oracle_chunk", type=int, default=32)
    p.add_argument("--stats_only", action="store_true",
                   help="recompute the summary JSON from the saved "
                        "pfn_per_dataset.npy + oracle_per_dataset.npz")
    p.add_argument("--label", default="")
    args = p.parse_args()

    if args.oracle_pass:
        oracle_pass(args.out, args.oracle_chunk)
        return
    if args.stats_only:
        import numpy as np

        pfn_mat = np.load(os.path.join(args.out, "pfn_per_dataset.npy"))
        orc = np.load(os.path.join(args.out, "oracle_per_dataset.npz"))
        positions = np.load(os.path.join(args.out, "eval_data.npz"))[
            "positions"
        ]
        _write_stats(args, pfn_mat, orc, positions, checkpoint="(stats only)")
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.evals import eval_positional_loss_per_dataset
    from pfn_tpu.priors.base import sample_y_for_buckets
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, full_support_bar_criterion
    from pfn_tpu.train.checkpoints import (
        latest_state_checkpoint,
        restore_checkpoint,
    )
    from pfn_tpu.train.loop import build_model

    os.makedirs(args.out, exist_ok=True)
    prior = GPPrior(num_features=1, **GP_HP)
    # Same bucket seed as fig3a_longrun so the criterion matches training.
    ys = sample_y_for_buckets(prior, 100_000, args.bptt, seed=7)
    criterion = full_support_bar_criterion(
        get_bucket_limits(args.num_buckets, ys=ys)
    )
    cfg = TrainConfig(
        emsize=512, nhid=1024, nlayers=6, nhead=4, bptt=args.bptt,
        batch_size=args.chunk_batch, dtype=jnp.bfloat16,
    )
    model = build_model(prior, criterion, cfg)
    latest = latest_state_checkpoint(args.ck)
    if latest is None:
        raise SystemExit(f"no checkpoint under {args.ck}")
    params = restore_checkpoint(latest[0])["state"]["params"]
    print(f"restored {latest[0]}", flush=True)

    positions = jnp.asarray([t for t in POSITIONS if t < args.bptt])
    xs, ys_, pfn = [], [], []
    for c in range(args.chunks):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), c)
        x, y, target_y = prior.sample(key, args.chunk_batch, args.bptt)
        per = eval_positional_loss_per_dataset(
            model, params, criterion, x, y, target_y, positions=positions
        )
        xs.append(np.asarray(x))
        ys_.append(np.asarray(y))
        pfn.append(np.asarray(per))  # (P, B)
        print(f"pfn chunk {c + 1}/{args.chunks} done", flush=True)
    np.savez(
        os.path.join(args.out, "eval_data.npz"),
        x=np.concatenate(xs), y=np.concatenate(ys_),
        positions=np.asarray(positions),
    )
    pfn_mat = np.concatenate(pfn, axis=1)  # (P, N)
    np.save(os.path.join(args.out, "pfn_per_dataset.npy"), pfn_mat)

    orc_path = os.path.join(args.out, "oracle_per_dataset.npz")
    if not os.path.exists(orc_path):
        # The oracle only depends on (seed, chunks, chunk_batch, bptt) — for
        # a second checkpoint scored on the same eval datasets, copy the
        # first run's oracle_per_dataset.npz into --out to skip this pass.
        import subprocess
        import sys

        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--oracle_pass",
             "--out", args.out, "--oracle_chunk", str(args.oracle_chunk)],
            check=True,
        )
    orc = np.load(orc_path)
    _write_stats(args, pfn_mat, orc, positions, checkpoint=latest[0])


def _write_stats(args, pfn_mat, orc, positions, checkpoint):
    import numpy as np

    rng = np.random.default_rng(0)
    out = {"positions": np.asarray(positions).tolist(),
           "n_datasets": int(pfn_mat.shape[1]),
           "checkpoint": checkpoint, "label": args.label}
    for name in ("nominal", "effective"):
        gap = pfn_mat - orc[name]  # (P, N)
        boots = np.stack([
            gap[:, rng.integers(0, gap.shape[1], gap.shape[1])].mean(axis=1)
            for _ in range(1000)
        ])  # (1000, P)
        out[f"gap_mean_{name}"] = gap.mean(axis=1).tolist()
        out[f"gap_median_{name}"] = np.median(gap, axis=1).tolist()
        out[f"gap_ci95_{name}"] = np.stack(
            [np.percentile(boots, 2.5, axis=0),
             np.percentile(boots, 97.5, axis=0)]
        ).T.tolist()
    with open(os.path.join(args.out, "robust_eval.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nrobust eval over {out['n_datasets']} datasets "
          "(gap vs effective-noise f64 oracle):")
    for i, t in enumerate(out["positions"]):
        lo, hi = out["gap_ci95_effective"][i]
        print(f"  ctx={t:4d} mean={out['gap_mean_effective'][i]:7.4f} "
              f"median={out['gap_median_effective'][i]:7.4f} "
              f"ci95=[{lo:7.4f},{hi:7.4f}]")


if __name__ == "__main__":
    main()

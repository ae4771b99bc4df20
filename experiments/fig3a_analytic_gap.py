"""Rao-Blackwellized Fig-3a gap: analytic KL(exact GP posterior || PFN bar).

The reference's Fig-3a protocol scores ONE sampled query y per (dataset,
context size) for both the PFN and the exact-GP oracle (reference
notebooks/SetupForGPFittingExperiments.ipynb cell 6; priors/fast_gp.py:88-120),
so the PFN-minus-oracle gap estimator carries the full variance of that
single draw — measured at ±0.3 nats between 32-dataset draws, and a 95% CI
half-width of ~0.03 nats even at 256 datasets (docs/results/
fig3a_robust_5000ep.json). That noise floor is 30x the 1e-3 nats target
(BASELINE.md metric 2), making the north star unmeasurable by sampling.

This script integrates the query draw out ANALYTICALLY. The oracle posterior
predictive is Gaussian, so by the tower property

    E_D E_{y|D}[nll_PFN(y) - nll_oracle(y)] = E_D[ KL(N(mu_D, var_D) || q_D) ]

and the per-dataset KL has a closed form against the FullSupport bar head
(BarDistribution.gaussian_cross_entropy: Gaussian bucket masses + truncated
second moments for the half-normal tails). Same population quantity, no
query-sample noise; per-dataset values are nonnegative KLs whose spread is
the only remaining variance.

Phases (all resumable, one output dir):
  A (accelerator) PFN bar logits at each eval position, chunked:
        pfn_logits.npy (P, N, num_buckets) + borders.npy + eval_data.npz
  B (CPU float64 subprocess) exact-GP posterior moments at the nominal AND
     effective noise (see docs/PERF.md "Numerical-fidelity note"), per-chunk
     checkpointed: oracle_moments.npz (means/vars, (P, N) each)
  C (CPU float64 subprocess) stats: per-dataset KL matrix, mean/median/
     bootstrap-CI gap table, variance comparison vs the single-draw
     estimator (if a robust_eval run shares --out's eval data), the n
     required for a 1e-3-resolution CI under each estimator, and the
     explicit met / unmet / unmeasurable verdict per context size.

    python experiments/fig3a_analytic_gap.py --ck results/fig3a/ck \
        --out results/fig3a/analytic_gap --data results/fig3a/robust_eval
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
# Default effective noise for data from the exact per-dataset f32 Cholesky
# sampler at T~2000 (docs/PERF.md "Numerical-fidelity note"). Grid-sampled
# runs (--grid > 0) pass the NOMINAL noise instead — their latent comes from
# a f64-factored constant matrix, so effective == nominal (measured,
# docs/results/grid_fidelity.json) and the two oracles coincide.
EFFECTIVE_NOISE = 1e-3
POSITIONS = [1, 2, 5, 10, 20, 50, 100, 200, 400, 700, 1000, 1400, 1800, 2000]
TARGET = 1e-3  # BASELINE.md metric 2 tolerance, nats


def moments_pass(out_dir: str, chunk: int, effective_noise: float):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from pfn_tpu.evals import gp_exact_posterior_moments

    data = np.load(os.path.join(out_dir, "eval_data.npz"))
    x, y, positions = data["x"], data["y"], data["positions"]
    acc = {f"{which}_{m}": [] for which in ("nominal", "effective")
           for m in ("mean", "var")}
    for s in range(0, len(x), chunk):
        part = os.path.join(out_dir, f"moments_chunk_{s // chunk:03d}.npz")
        if os.path.exists(part):
            p = dict(np.load(part))
        else:
            xb, yb = jnp.asarray(x[s : s + chunk]), jnp.asarray(y[s : s + chunk])
            p = {}
            for which, hp in (
                ("nominal", GP_HP),
                ("effective", dict(GP_HP, noise=effective_noise)),
            ):
                mean, var = gp_exact_posterior_moments(
                    xb, yb, hp, positions=jnp.asarray(positions),
                    dtype=jnp.float64,
                )
                p[f"{which}_mean"] = np.asarray(mean)
                p[f"{which}_var"] = np.asarray(var)
            np.savez(part, **p)
        for k in acc:
            acc[k].append(p[k])
        print(f"moments chunk {s // chunk + 1} done", flush=True)
    np.savez(
        os.path.join(out_dir, "oracle_moments.npz"),
        effective_noise=np.asarray(effective_noise),
        **{k: np.concatenate(v, axis=1) for k, v in acc.items()},
    )


def stats_pass(out_dir: str, label: str, sampled_dir: str | None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from pfn_tpu.distributions import FullSupportBarDistribution

    logits = np.load(os.path.join(out_dir, "pfn_logits.npy"))  # (P, N, K)
    borders = np.load(os.path.join(out_dir, "borders.npy"))
    mom = np.load(os.path.join(out_dir, "oracle_moments.npz"))
    positions = np.load(os.path.join(out_dir, "eval_data.npz"))["positions"]
    dist = FullSupportBarDistribution.create(borders)

    out = {"positions": positions.tolist(), "n_datasets": int(logits.shape[1]),
           "label": label, "target_nats": TARGET}
    if "effective_noise" in mom:
        out["effective_noise"] = float(mom["effective_noise"])
    rng = np.random.default_rng(0)
    for which in ("nominal", "effective"):
        mu = jnp.asarray(mom[f"{which}_mean"], jnp.float64)  # (P, N)
        var = jnp.asarray(mom[f"{which}_var"], jnp.float64)
        kl = np.asarray(
            dist.gaussian_kl(jnp.asarray(logits, jnp.float64), mu, var)
        )  # (P, N)
        boots = np.stack([
            kl[:, rng.integers(0, kl.shape[1], kl.shape[1])].mean(axis=1)
            for _ in range(2000)
        ])
        ci = np.stack([np.percentile(boots, 2.5, axis=0),
                       np.percentile(boots, 97.5, axis=0)]).T
        out[f"kl_mean_{which}"] = kl.mean(axis=1).tolist()
        out[f"kl_median_{which}"] = np.median(kl, axis=1).tolist()
        out[f"kl_ci95_{which}"] = ci.tolist()
        out[f"kl_std_{which}"] = kl.std(axis=1, ddof=1).tolist()
        # n for a 1e-3-resolution verdict: CI half-width 1.96*sd/sqrt(n) <= target.
        out[f"n_for_1e3_{which}"] = [
            int(np.ceil((1.96 * s / TARGET) ** 2))
            for s in kl.std(axis=1, ddof=1)
        ]

    # Variance comparison against the single-draw estimator on the SAME
    # datasets, if a robust_eval run is colocated / linked.
    if sampled_dir:
        pfn_p = os.path.join(sampled_dir, "pfn_per_dataset.npy")
        orc_p = os.path.join(sampled_dir, "oracle_per_dataset.npz")
        if os.path.exists(pfn_p) and os.path.exists(orc_p):
            gap = np.load(pfn_p) - np.load(orc_p)["effective"]  # (P, N)
            out["sampled_gap_std"] = gap.std(axis=1, ddof=1).tolist()
            out["sampled_n_for_1e3"] = [
                int(np.ceil((1.96 * s / TARGET) ** 2))
                for s in gap.std(axis=1, ddof=1)
            ]
            out["variance_reduction"] = [
                float((sg / max(ag, 1e-12)) ** 2)
                for sg, ag in zip(gap.std(axis=1, ddof=1),
                                  np.asarray(out["kl_std_effective"]))
            ]

    # Per-position verdict vs the effective-noise oracle (the one matching
    # the training data's actual noise; the nominal gap additionally charges
    # the PFN for the f32 sampler's fidelity, see docs/PERF.md).
    verdicts = []
    for i, t in enumerate(out["positions"]):
        lo, hi = out["kl_ci95_effective"][i]
        half = (hi - lo) / 2
        if half > TARGET:
            v = "unmeasurable-at-this-n" if lo <= TARGET else "unmet"
        else:
            v = "met" if hi <= TARGET else "unmet"
        verdicts.append(v)
    out["verdict_effective"] = verdicts

    with open(os.path.join(out_dir, "analytic_gap.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nanalytic KL gap over {out['n_datasets']} datasets "
          "(vs effective-noise f64 oracle):")
    for i, t in enumerate(out["positions"]):
        lo, hi = out["kl_ci95_effective"][i]
        print(f"  ctx={t:4d} mean={out['kl_mean_effective'][i]:9.5f} "
              f"median={out['kl_median_effective'][i]:9.5f} "
              f"ci95=[{lo:9.5f},{hi:9.5f}]  {verdicts[i]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ck", default="results/fig3a/ck")
    p.add_argument("--out", default="results/fig3a/analytic_gap")
    p.add_argument("--data", default=None,
                   help="dir with an existing eval_data.npz to reuse (e.g. "
                        "the robust_eval dir — enables the paired variance "
                        "comparison)")
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--chunk_batch", type=int, default=32)
    p.add_argument("--bptt", type=int, default=2010)
    p.add_argument("--num_buckets", type=int, default=1000)
    p.add_argument("--bucket_seq_cap", type=int, default=None,
                   help="must match the trained run's --bucket_seq_cap so "
                        "the rebuilt criterion borders equal the model's")
    p.add_argument("--seed", type=int, default=991)
    p.add_argument("--label", default="")
    p.add_argument("--moments_pass", action="store_true")
    p.add_argument("--moments_chunk", type=int, default=32)
    p.add_argument("--stats_only", action="store_true")
    p.add_argument("--grid", type=int, default=0,
                   help="must match the trained run's --grid: rebuilds the "
                        "same bucket borders AND samples eval data from the "
                        "same (grid-x) prior")
    p.add_argument("--effective_noise", type=float, default=None,
                   help="effective-noise oracle's noise (default: 1e-3 for "
                        "exact-sampler runs, nominal for --grid runs)")
    args = p.parse_args()

    eff_noise = args.effective_noise
    if eff_noise is None:
        eff_noise = GP_HP["noise"] if args.grid > 0 else EFFECTIVE_NOISE

    if args.moments_pass:
        moments_pass(args.out, args.moments_chunk, eff_noise)
        return
    if args.stats_only:
        stats_pass(args.out, args.label, args.data)
        return

    import numpy as np

    os.makedirs(args.out, exist_ok=True)
    logits_path = os.path.join(args.out, "pfn_logits.npy")
    if not os.path.exists(logits_path):
        import jax
        import jax.numpy as jnp

        from pfn_tpu.distributions import get_bucket_limits
        from pfn_tpu.evals import eval_positional_logits_per_dataset
        from pfn_tpu.priors.base import sample_y_for_buckets
        from pfn_tpu.priors.gp import GPPrior
        from pfn_tpu.train import TrainConfig, full_support_bar_criterion
        from pfn_tpu.train.checkpoints import (
            latest_state_checkpoint,
            restore_checkpoint,
        )
        from pfn_tpu.train.loop import build_model

        prior = GPPrior(num_features=1, grid=args.grid, **GP_HP)
        ys = sample_y_for_buckets(prior, 100_000, args.bptt, seed=7,
                                  max_seq_len=args.bucket_seq_cap)
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

        data_src = os.path.join(args.data or args.out, "eval_data.npz")
        positions = np.asarray([t for t in POSITIONS if t < args.bptt])
        if os.path.exists(data_src):
            d = np.load(data_src)
            x, y = d["x"], d["y"]
            assert (d["positions"] == positions).all(), "position mismatch"
            print(f"reusing {len(x)} eval datasets from {data_src}")
        else:
            xs, ys_ = [], []
            for c in range(args.chunks):
                key = jax.random.fold_in(jax.random.PRNGKey(args.seed), c)
                xc, yc, _ = prior.sample(key, args.chunk_batch, args.bptt)
                xs.append(np.asarray(xc))
                ys_.append(np.asarray(yc))
            x, y = np.concatenate(xs), np.concatenate(ys_)
        np.savez(os.path.join(args.out, "eval_data.npz"),
                 x=x, y=y, positions=positions)

        chunks = []
        for s in range(0, len(x), args.chunk_batch):
            lg = eval_positional_logits_per_dataset(
                model, params,
                jnp.asarray(x[s : s + args.chunk_batch]),
                jnp.asarray(y[s : s + args.chunk_batch]),
                jnp.asarray(positions),
            )
            chunks.append(np.asarray(lg, np.float32))
            print(f"pfn logits chunk {s // args.chunk_batch + 1} done",
                  flush=True)
        np.save(logits_path, np.concatenate(chunks, axis=1))
        np.save(os.path.join(args.out, "borders.npy"),
                np.asarray(criterion.bar.borders))

    me = os.path.abspath(__file__)
    if not os.path.exists(os.path.join(args.out, "oracle_moments.npz")):
        subprocess.run(
            [sys.executable, me, "--moments_pass", "--out", args.out,
             "--moments_chunk", str(args.moments_chunk),
             "--effective_noise", str(eff_noise)],
            check=True,
        )
    cmd = [sys.executable, me, "--stats_only", "--out", args.out,
           "--label", args.label]
    if args.data:
        cmd += ["--data", args.data]
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()

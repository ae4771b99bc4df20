"""Bar-head resolution floor: the KL no model with this head can beat.

The analytic-gap estimator (experiments/fig3a_analytic_gap.py) measures
E_D[KL(oracle posterior || PFN bar head)]. Part of that KL is NOT model
error: a piecewise-constant density on fixed borders cannot represent a
continuous Gaussian exactly, so even the best possible logits leave a
residual KL(N(mu, sigma^2) || best bar fit). This script computes that
floor per context size from the committed oracle moments, for both the
1000-bucket head (the trained runs) and the 10,000-bucket head (the
notebook's other grid point — reference
SetupForGPFittingExperiments.ipynb cell 5), answering round-3 VERDICT
item "bucket count is the head's resolution limit — plausibly the
binding constraint" with a number instead of a plausibly.

Method: for each (position, dataset) oracle moment (mu, sigma), the
optimal in-support bar density puts mass m_i = Phi((b_{i+1}-mu)/sigma) -
Phi((b_i-mu)/sigma) uniformly over bucket i, giving

    KL_floor = sum_i  int_bucket f log(f w_i / m_i)

computed by numerical quadrature restricted to the borders' span. Mass
outside the span is handled by the FullSupport half-normal tails, whose
best-case contribution we lower-bound by 0, so the reported floor is a
LOWER bound (tight wherever tail mass is negligible; the out-of-support
mass is reported alongside).

Borders are regenerated exactly as fig3a_longrun.py builds them
(equal-mass from 100k prior ys, seed 7) and cross-checked against the
committed borders.npy.

    python experiments/bar_resolution_floor.py \
        --moments results/fig3a_mix500/analytic_gap/oracle_moments.npz \
        --analytic results/fig3a_mix500/analytic_gap/analytic_gap.json \
        --out docs/results/bar_resolution_floor.json
"""

from __future__ import annotations

import argparse
import json
import math

import numpy as np
from scipy.special import erf


def gaussian_bar_floor(mu: float, sigma: float, borders: np.ndarray,
                       pts_per_bucket: int = 9) -> tuple[float, float]:
    """(lower-bound KL floor, out-of-support mass) for N(mu, sigma^2)."""
    # float64 throughout: float32 borders would drag the whole pipeline to
    # float32, where the 1e-300 clamps underflow to 0 and produce inf KLs.
    borders = np.asarray(borders, np.float64)
    lo, hi = borders[0], borders[-1]
    # Only buckets within mu +- 10 sigma contribute measurably.
    a = np.searchsorted(borders, mu - 10 * sigma) - 1
    b = np.searchsorted(borders, mu + 10 * sigma) + 1
    a = max(0, a)
    b = min(len(borders) - 1, b)
    if a >= b:  # posterior entirely outside the support span
        out = 1.0
        return 0.0, out
    bl = borders[a:b]
    br = borders[a + 1:b + 1]
    z = lambda t: (t - mu) / (sigma * math.sqrt(2.0))
    masses = 0.5 * (erf(z(br)) - erf(z(bl)))
    widths = br - bl
    # Quadrature nodes per bucket (midpoint-composite; buckets are narrow
    # relative to sigma wherever mass is non-negligible).
    t = (np.arange(pts_per_bucket) + 0.5) / pts_per_bucket
    ys = bl[:, None] + widths[:, None] * t[None, :]
    f = np.exp(-0.5 * ((ys - mu) / sigma) ** 2) / (
        sigma * math.sqrt(2 * math.pi))
    q = np.maximum(masses / np.maximum(widths, 1e-300), 1e-300)[:, None]
    integrand = np.where(f > 0, f * (np.log(np.maximum(f, 1e-300))
                                     - np.log(q)), 0.0)
    kl = float(np.sum(integrand.mean(axis=1) * widths))
    out_mass = 0.5 * (2.0 - erf(z(hi)) + erf(z(lo)))
    # Clamp tiny negative quadrature noise.
    return max(kl, 0.0), float(np.clip(out_mass, 0.0, 1.0))


def make_borders(num_buckets: int, bptt: int,
                 seq_cap: int | None = None) -> np.ndarray:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.priors.base import sample_y_for_buckets
    from pfn_tpu.priors.gp import GPPrior

    prior = GPPrior(num_features=1, noise=1e-4, outputscale=1.0,
                    lengthscale=0.6)
    ys = sample_y_for_buckets(prior, 100_000, bptt, seed=7,
                              max_seq_len=seq_cap)
    return np.asarray(get_bucket_limits(num_buckets, ys=ys))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--moments",
                    default="results/fig3a_mix500/analytic_gap/"
                            "oracle_moments.npz")
    ap.add_argument("--analytic",
                    default="results/fig3a_mix500/analytic_gap/"
                            "analytic_gap.json")
    ap.add_argument("--check_borders",
                    default="results/fig3a_mix500/analytic_gap/borders.npy")
    ap.add_argument("--bptt", type=int, default=2010)
    ap.add_argument("--buckets", type=int, nargs="+",
                    default=[1000, 10000])
    ap.add_argument("--seq_cap", type=int, default=None,
                    help="build borders from a decorrelated bucket sample "
                         "(sample_y_for_buckets max_seq_len); implies "
                         "cpu-regenerated borders for every bucket count")
    ap.add_argument("--out", default="docs/results/bar_resolution_floor.json")
    args = ap.parse_args()

    mom = np.load(args.moments)
    mus = mom["effective_mean"]     # (P, N)
    sigmas = np.sqrt(mom["effective_var"])
    gap = json.load(open(args.analytic))
    positions = gap["positions"]
    assert mus.shape[0] == len(positions)

    result = {
        "positions": positions,
        "n_datasets": int(mus.shape[1]),
        "measured_kl_mean_effective": gap["kl_mean_effective"],
        "measured_kl_median_effective": gap["kl_median_effective"],
        "note": ("floor is a LOWER bound: optimal half-normal tail "
                 "contribution bounded by 0; out_of_support_mass_mean "
                 "reports where that matters"),
    }
    if args.seq_cap:
        result["seq_cap"] = args.seq_cap
    for nb in args.buckets:
        if nb == 1000 and args.check_borders and not args.seq_cap:
            # Use the model's ACTUAL borders (saved by the analytic-gap
            # pipeline from the checkpointed criterion). A CPU regeneration
            # differs slightly (mean |delta| ~0.02): the TPU sampler path
            # consumes randomness differently, and equal-mass quantiles of
            # 100k draws move by the local sample spacing.
            borders = np.load(args.check_borders)
            result["borders_1000b"] = "committed (exact)"
        else:
            # Statistically equivalent construction (same prior, same
            # equal-mass recipe); floors depend on bucket-width scale, not
            # exact placement.
            borders = make_borders(nb, args.bptt, seq_cap=args.seq_cap)
            result[f"borders_{nb}b"] = "cpu-regenerated (equivalent in law)"
        floors = np.zeros_like(mus)
        outs = np.zeros_like(mus)
        for p in range(mus.shape[0]):
            for n in range(mus.shape[1]):
                floors[p, n], outs[p, n] = gaussian_bar_floor(
                    float(mus[p, n]), float(sigmas[p, n]), borders)
        result[f"floor_mean_{nb}b"] = [float(x) for x in floors.mean(1)]
        result[f"floor_median_{nb}b"] = [
            float(x) for x in np.median(floors, 1)]
        result[f"out_of_support_mass_mean_{nb}b"] = [
            float(x) for x in outs.mean(1)]

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)

    print(f"{'ctx':>5} {'measured':>9} " + " ".join(
        f"floor_{nb}b" for nb in args.buckets))
    for i, ctx in enumerate(positions):
        floors_str = " ".join(
            f"{result[f'floor_mean_{nb}b'][i]:9.5f}" for nb in args.buckets)
        print(f"{ctx:>5} {gap['kl_mean_effective'][i]:9.5f} {floors_str}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

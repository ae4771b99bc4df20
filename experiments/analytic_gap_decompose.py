"""Decompose the analytic Fig-3a KL into interior vs tail contributions.

The bucket-resolution floor (experiments/bar_resolution_floor.py) showed
the interior discretization floor is ~2% of the measured 0.2-nat KL at
500 epochs — but 0.7-3% of oracle posterior mass sits OUTSIDE the
equal-mass borders' span, where the FullSupport head models it with
half-normal tails. This script attributes the measured KL between the
two regions, per context size, from the committed analytic-gap
intermediates (pfn_logits.npy + oracle_moments.npz + borders.npy):

    KL_total    = gaussian_kl(logits, mu, var)   (library closed form)
    KL_interior = sum_inner int_bucket f log(f / (p_k / w_k))
    KL_tail     = KL_total - KL_interior

If KL_tail dominates, the round-5 lever is tail/border modeling (wider
support span, heavier tails), not more epochs. Also reports how
concentrated the per-dataset KL is (share of the mean held by the worst
8 of 128 datasets).

    python experiments/analytic_gap_decompose.py \
        --dir results/fig3a_mix500/analytic_gap \
        --out docs/results/analytic_gap_decompose_mix500.json
"""

from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np
from scipy.special import erf


def interior_kl(mu: float, sigma: float, borders: np.ndarray,
                log_p: np.ndarray, pts_per_bucket: int = 9) -> float:
    """int over the INNER buckets of f log(f / (p_k/w_k)).

    Inner = buckets 1..K-2 (bucket 0 and K-1 are the half-normal tails in
    FullSupportBarDistribution; their in-span parts are negligible by
    construction — equal-mass edge buckets carry ~1/K mass).
    """
    borders = np.asarray(borders, np.float64)
    a = max(1, np.searchsorted(borders, mu - 10 * sigma) - 1)
    b = min(len(borders) - 2, np.searchsorted(borders, mu + 10 * sigma) + 1)
    if a >= b:
        return 0.0
    bl, br = borders[a:b], borders[a + 1:b + 1]
    widths = br - bl
    z = lambda t: (t - mu) / (sigma * math.sqrt(2.0))
    masses = 0.5 * (erf(z(br)) - erf(z(bl)))
    t = (np.arange(pts_per_bucket) + 0.5) / pts_per_bucket
    ys = bl[:, None] + widths[:, None] * t[None, :]
    f = np.exp(-0.5 * ((ys - mu) / sigma) ** 2) / (
        sigma * math.sqrt(2 * math.pi))
    # log model density per bucket: log p_k - log w_k.
    log_q = (log_p[a:b] - np.log(widths))[:, None]
    flogf = np.where(f > 0, f * np.log(np.maximum(f, 1e-300)), 0.0)
    integrand = flogf - f * log_q
    kl = float(np.sum(integrand.mean(axis=1) * widths))
    # Subtracting two integrals; tiny negative numerical residue possible
    # only where masses ~ 0.
    del masses
    return kl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="results/fig3a_mix500/analytic_gap")
    ap.add_argument("--label", default="")
    ap.add_argument("--out",
                    default="docs/results/analytic_gap_decompose.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pfn_tpu.distributions import FullSupportBarDistribution

    borders = np.load(os.path.join(args.dir, "borders.npy")).astype(
        np.float64)
    mom = np.load(os.path.join(args.dir, "oracle_moments.npz"))
    logits = np.load(os.path.join(args.dir, "pfn_logits.npy"))
    gap = json.load(open(os.path.join(args.dir, "analytic_gap.json")))
    positions = gap["positions"]
    mus, vars = mom["effective_mean"], mom["effective_var"]
    P, N = mus.shape

    dist = FullSupportBarDistribution(jnp.asarray(borders))
    total = np.asarray(
        dist.gaussian_kl(jnp.asarray(logits, jnp.float64),
                         jnp.asarray(mus), jnp.asarray(vars)))
    # Cross-check against the committed aggregates.
    err = float(np.max(np.abs(total.mean(1) - np.asarray(
        gap["kl_mean_effective"]))))
    assert err < 1e-6, f"total-KL mismatch vs committed stats: {err}"

    log_p = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits, jnp.float64), axis=-1))
    interior = np.zeros((P, N))
    for p in range(P):
        for n in range(N):
            interior[p, n] = interior_kl(
                float(mus[p, n]), float(np.sqrt(vars[p, n])), borders,
                log_p[p, n])
    tail = total - interior

    # Concentration: share of sum held by the worst 8 datasets.
    srt = np.sort(total, axis=1)
    top8_share = srt[:, -8:].sum(1) / np.maximum(srt.sum(1), 1e-300)

    result = {
        "label": args.label, "positions": positions, "n_datasets": int(N),
        "kl_total_mean": [float(x) for x in total.mean(1)],
        "kl_interior_mean": [float(x) for x in interior.mean(1)],
        "kl_tail_mean": [float(x) for x in tail.mean(1)],
        "kl_total_median": [float(x) for x in np.median(total, 1)],
        "kl_interior_median": [float(x) for x in np.median(interior, 1)],
        "top8of128_share_of_total": [float(x) for x in top8_share],
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)

    print(f"{'ctx':>5} {'total':>8} {'interior':>9} {'tail':>8} {'top8%':>6}")
    for i, ctx in enumerate(positions):
        print(f"{ctx:>5} {result['kl_total_mean'][i]:8.4f} "
              f"{result['kl_interior_mean'][i]:9.4f} "
              f"{result['kl_tail_mean'][i]:8.4f} "
              f"{100 * result['top8of128_share_of_total'][i]:5.1f}%")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

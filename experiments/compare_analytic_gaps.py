"""Compare analytic-gap artifacts (fig3a_analytic_gap.py outputs).

Prints a markdown table of the Rao-Blackwellized KL (effective-noise
oracle) per context size for each run — mean [95% CI] and median — and,
for exactly two runs, the per-position difference with the
non-overlap-of-CIs significance flag. Used for the mixture-vs-weighted
A/B on the analytic estimator and for the epochs/bucket scaling tables.

    python experiments/compare_analytic_gaps.py \
        docs/results/analytic_gap_w500.json \
        docs/results/analytic_gap_mix500.json --labels weighted mixture
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--labels", nargs="+", default=None)
    ap.add_argument("--stat", choices=["mean", "median"], default="mean")
    args = ap.parse_args()
    labels = args.labels or [f"run{i}" for i in range(len(args.runs))]
    assert len(labels) == len(args.runs)

    data = [json.load(open(r)) for r in args.runs]
    positions = data[0]["positions"]
    for d in data[1:]:
        assert d["positions"] == positions, "position grids differ"

    key = f"kl_{args.stat}_effective"
    print("| ctx | " + " | ".join(labels) + " |")
    print("|---|" + "---|" * len(labels))
    for i, ctx in enumerate(positions):
        cells = []
        for d in data:
            v = d[key][i]
            lo, hi = d["kl_ci95_effective"][i]
            cells.append(f"{v:.4f} [{lo:.4f}, {hi:.4f}]"
                         if args.stat == "mean" else f"{v:.4f}")
        print(f"| {ctx} | " + " | ".join(cells) + " |")

    if len(data) == 2:
        a, b = data
        print(f"\nper-position {labels[1]} − {labels[0]} ({args.stat} KL, "
              "* = 95% CIs disjoint):")
        for i, ctx in enumerate(positions):
            diff = b[key][i] - a[key][i]
            alo, ahi = a["kl_ci95_effective"][i]
            blo, bhi = b["kl_ci95_effective"][i]
            sig = "*" if (bhi < alo or ahi < blo) else " "
            print(f"  ctx={ctx:>5} {diff:+.4f}{sig}")


if __name__ == "__main__":
    main()

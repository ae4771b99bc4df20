"""Compare two fig3a_longrun curve artifacts position-by-position.

Used for the VERDICT-4 A/B: the train-time mixture eval-pos sampler
(0.9*weighted + 0.1*uniform-capped-300) vs the reference's pure weighted
sampler (reference utils.py:59-73) at a matched epoch budget. Prints a
markdown gap table (PFN NLL minus the effective-noise float64 oracle NLL)
and the acceptance verdict: mixture must cut the starved small-context
gaps without hurting ctx >= 400.

Usage:
    python experiments/compare_fig3a_runs.py docs/results/fig3a_500ep.json \
        docs/results/fig3a_mix_500ep.json --labels weighted mixture
"""
from __future__ import annotations

import argparse
import json


def gaps(path: str) -> tuple[list[int], list[float]]:
    d = json.load(open(path))
    oracle = d.get("oracle_nll_noise1e-3") or d["oracle_nll"]
    return [int(p) for p in d["positions"]], [
        float(p) - float(o) for p, o in zip(d["pfn_nll"], oracle)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--labels", nargs="+", default=None)
    args = ap.parse_args()
    labels = args.labels or [f"run{i}" for i in range(len(args.runs))]
    assert len(labels) == len(args.runs)

    tables = [gaps(r) for r in args.runs]
    positions = tables[0][0]
    for pos, _ in tables[1:]:
        assert pos == positions, "runs evaluated at different positions"

    print("| ctx | " + " | ".join(labels) + " |")
    print("|---|" + "---|" * len(labels))
    for i, ctx in enumerate(positions):
        row = " | ".join(f"{t[1][i]:.3f}" for t in tables)
        print(f"| {ctx} | {row} |")

    if len(tables) == 2:
        base, new = tables[0][1], tables[1][1]
        small = [i for i, c in enumerate(positions) if c <= 50]
        large = [i for i, c in enumerate(positions) if c >= 400]
        ds = sum(base[i] - new[i] for i in small) / max(1, len(small))
        dl = sum(new[i] - base[i] for i in large) / max(1, len(large))
        print(f"\nmean small-ctx (<=50) gap cut: {ds:+.3f} nats")
        print(f"mean large-ctx (>=400) gap regression: {dl:+.3f} nats")
        verdict = "PASS" if ds > 0.1 and dl < 0.05 else "CHECK"
        print(f"verdict: {verdict} (pass = cuts small-ctx >0.1, "
              f"regresses large-ctx <0.05)")


if __name__ == "__main__":
    main()

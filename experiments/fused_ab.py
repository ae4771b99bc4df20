"""A/B: fused whole-layer Pallas kernels vs the XLA-fused dense step.

Runs the bench measurement (flagship shape, fully fused train step)
back-to-back in ONE process — the only trustworthy comparison on the
tunneled chip (timing variance across processes is ±20-50%, docs/PERF.md).
ABA order (baseline, fused, baseline again) exposes drift.

Writes docs/results/fused_ab.json and prints a summary. The VERDICT round-2
"done" bar: bench >= 200 b/s with the fused path, or a committed A/B showing
the fused kernel loses and the measured reason.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_pfn_tpu  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--grid", type=int, default=2048)
    p.add_argument("--updates_per_call", type=int, default=25)
    p.add_argument("--out", default="docs/results/fused_ab.json")
    args = p.parse_args()

    kw = dict(steps=args.steps, grid=args.grid,
              updates_per_call=args.updates_per_call)
    results = {}
    for label, impl in [("baseline_a", "auto"), ("fused", "fused"),
                        ("baseline_b", "auto")]:
        v = measure_pfn_tpu(attention_impl=impl, **kw)
        results[label] = v
        print(f"{label:12s} ({impl}): {v:.1f} prior-batches/sec", flush=True)

    base = 0.5 * (results["baseline_a"] + results["baseline_b"])
    results["speedup"] = results["fused"] / base
    results["config"] = kw
    print(f"fused speedup vs XLA dense step: {results['speedup']:.3f}x")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

"""Regenerate the Fig-3a figures from the fig3a_*ep.json curves.

docs/results/fig3a_curves.png — PFN NLL vs context size at bptt=2010 for
each completed training schedule, against the float64 exact-GP oracle at
the sampler's effective noise (the honest ground truth — docs/PERF.md
"Numerical-fidelity note"). Epoch count is an ordered magnitude, so the
curves wear one blue ramp light→dark (ordinal steps); the oracle is
neutral ink, dashed.

docs/results/fig3a_sampler_ab.png — the matched-500-epoch eval-position
sampler A/B (reference weighted sampler vs the train-time mixture,
docs/PERF.md "Train-time mixture sampler"): gap to the oracle vs context
size, two categorical series (slots 1-2 of the validated palette).

    python experiments/plot_fig3a.py
"""

from __future__ import annotations

import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

RESULTS = os.path.join(os.path.dirname(__file__), "..", "docs", "results")
# Ordinal blue ramp, light -> dark (pre-validated steps 250/400/550/700).
RAMP = ["#86b6ef", "#3987e5", "#1c5cab", "#0d366b"]
INK = "#3d3d3a"
MUTED = "#73726c"
MIN_CTX = 20  # the weighted eval-pos sampler barely trains ctx<20 at T=2010


def main():
    runs = []
    for path in sorted(glob.glob(os.path.join(RESULTS, "fig3a_*ep.json"))):
        with open(path) as f:
            d = json.load(f)
        if "epochs" not in d or "pfn_nll" not in d:
            continue  # robust-eval / non-curve artifacts share the pattern
        runs.append(d)
    runs.sort(key=lambda d: d["epochs"])
    assert runs, "no fig3a_*ep.json found"
    if len(runs) > len(RAMP):
        dropped = [d["epochs"] for d in runs[: -len(RAMP)]]
        print(f"note: plotting the {len(RAMP)} longest schedules; "
              f"dropping epochs={dropped}")
        runs = runs[-len(RAMP):]

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=160)
    base = runs[-1]
    pos = [p for p in base["positions"] if p >= MIN_CTX]
    sel = [i for i, p in enumerate(base["positions"]) if p >= MIN_CTX]
    # Effective-noise oracle preferred (the honest ground truth for the f32
    # on-device sampler, PERF.md); fall back to the nominal-noise oracle for
    # runs that predate the dual-oracle longrun driver.
    oracle_key = (
        "oracle_nll_noise1e-3" if "oracle_nll_noise1e-3" in base else "oracle_nll"
    )
    oracle = [base[oracle_key][i] for i in sel]
    ax.plot(
        pos, oracle, "--", color=INK, lw=2,
        label="exact GP posterior (f64 oracle)", zorder=5,
    )

    colors = RAMP[-len(runs):] if len(runs) <= len(RAMP) else RAMP
    for d, c in zip(runs, colors):
        s = [i for i, p in enumerate(d["positions"]) if p >= MIN_CTX]
        ax.plot(
            [d["positions"][i] for i in s],
            [d["pfn_nll"][i] for i in s],
            "-o", color=c, lw=2, ms=4,
            label=f"PFN, {d['epochs']} epochs",
        )

    ax.set_xscale("log")
    ax.set_xlabel("context size (datapoints conditioned on)", color=INK)
    ax.set_ylabel("eval NLL (nats)", color=INK)
    ax.set_title(
        "Amortized posterior converges to the exact GP posterior "
        "(bptt=2010, Fig-3a protocol)",
        color=INK, fontsize=11,
    )
    ax.grid(True, which="both", color="#e8e6e3", lw=0.6, zorder=0)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(MUTED)
    ax.tick_params(colors=MUTED)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    fig.tight_layout()
    out = os.path.join(RESULTS, "fig3a_curves.png")
    fig.savefig(out)
    print(f"wrote {out}")


# Categorical slots 1-2 (documented-validated adjacent pair, light mode).
CAT = {"weighted": "#2a78d6", "mixture": "#eb6834"}


def _gaps(d):
    oracle = d.get("oracle_nll_noise1e-3") or d["oracle_nll"]
    return d["positions"], [
        float(p) - float(o) for p, o in zip(d["pfn_nll"], oracle)
    ]


def sampler_ab():
    paths = {
        "weighted": os.path.join(RESULTS, "fig3a_500ep.json"),
        "mixture": os.path.join(RESULTS, "fig3a_mix_500ep.json"),
    }
    if not all(os.path.exists(p) for p in paths.values()):
        print("sampler A/B: missing curve artifacts, skipping")
        return
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=160)
    for name, path in paths.items():
        with open(path) as f:
            pos, gap = _gaps(json.load(f))
        ax.plot(pos, gap, "-o", color=CAT[name], lw=2, ms=4,
                label=f"{name} sampler @500 epochs")
        # Direct label at ctx=10, where the two series are well separated;
        # weighted sits above the mixture curve there.
        i = pos.index(10)
        dy = 8 if name == "weighted" else -14
        ax.annotate(name, (pos[i], gap[i]), textcoords="offset points",
                    xytext=(6, dy), color=CAT[name], fontsize=9)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("context size (datapoints conditioned on)", color=INK)
    ax.set_ylabel("NLL gap to exact GP posterior (nats)", color=INK)
    ax.set_title(
        "Train-time mixture eval-pos sampler repairs starved small "
        "contexts\n(matched 500-epoch budget, bptt=2010)",
        color=INK, fontsize=11,
    )
    ax.grid(True, which="both", color="#e8e6e3", lw=0.6, zorder=0)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(MUTED)
    ax.tick_params(colors=MUTED)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    fig.tight_layout()
    out = os.path.join(RESULTS, "fig3a_sampler_ab.png")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
    sampler_ab()

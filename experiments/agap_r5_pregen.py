"""Pre-generate the round-5 analytic-gap inputs that do NOT need the chip.

fig3a_analytic_gap.py's three passes are (1) PFN logits on the accelerator,
(2) f64 exact-GP posterior moments on CPU, (3) stats. Passes (2) and the
eval-data draw depend only on the prior + seed, so while the chip is busy
training (or down) this script produces ``results/agap_r5/eval_data.npz``
and ``oracle_moments.npz`` up front; the chain's scoring step then only pays
for the (fast) logits pass on the chip.

Must mirror fig3a_analytic_gap.py's sampling exactly: grid-8192 GPPrior,
chunks x chunk_batch datasets via fold_in(PRNGKey(seed), chunk), bptt=2010,
POSITIONS < bptt. The moments subprocess is the script's own --moments_pass
(so the npz layout stays canonical).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
POSITIONS = [1, 2, 5, 10, 20, 50, 100, 200, 400, 700, 1000, 1400, 1800, 2000]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/agap_r5")
    p.add_argument("--grid", type=int, default=8192)
    p.add_argument("--bptt", type=int, default=2010)
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--chunk_batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=991)
    p.add_argument("--moments_chunk", type=int, default=32)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    data_path = os.path.join(args.out, "eval_data.npz")
    if not os.path.exists(data_path):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from pfn_tpu.priors.gp import GPPrior

        prior = GPPrior(num_features=1, grid=args.grid, **GP_HP)
        positions = np.asarray([t for t in POSITIONS if t < args.bptt])
        xs, ys = [], []
        sample = jax.jit(
            lambda k: prior.sample(k, args.chunk_batch, args.bptt)
        )
        for c in range(args.chunks):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), c)
            xc, yc, _ = sample(key)
            xs.append(np.asarray(xc))
            ys.append(np.asarray(yc))
            print(f"eval-data chunk {c + 1}/{args.chunks} done", flush=True)
        np.savez(data_path, x=np.concatenate(xs), y=np.concatenate(ys),
                 positions=positions)

    if not os.path.exists(os.path.join(args.out, "oracle_moments.npz")):
        me = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fig3a_analytic_gap.py")
        subprocess.run(
            [sys.executable, me, "--moments_pass", "--out", args.out,
             "--moments_chunk", str(args.moments_chunk),
             "--grid", str(args.grid),
             "--effective_noise", str(GP_HP["noise"])],
            check=True,
        )
    print("pregen complete", flush=True)


if __name__ == "__main__":
    main()

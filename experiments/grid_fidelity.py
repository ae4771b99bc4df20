"""Numerical-fidelity audit of the grid GP sampler at the Fig-3a scale.

The exact per-dataset f32 Cholesky sampler at T~2000 carries ~1e-3 of
structured factorization error ("effective noise", docs/PERF.md) — an error
floor of the same order as the 1e-3 nats north-star target. The grid fast
path (ops/gp_sample.py:gp_sample_paths_grid) eliminates it by construction:
the latent factor is computed ONCE in float64 and only the (B, G) x (G, G)
matmul runs in f32. This script measures that claim so the round-5 long run
can score against the nominal-noise oracle:

  1. duplicate-pair noise estimate — with T=2010 draws over G grid points,
     ~T^2/(2G) within-dataset pairs share an x. Repeated x get IDENTICAL
     latent f, so var((y_i - y_j)/sqrt(2)) over such pairs estimates the
     total effective observation noise directly (no oracle involved).
  2. latent numerical error — the f32 on-device latent draw (circulant-FFT
     path by default, ops/gp_sample.py:_grid_latent_fft; --method chol for
     the dense-factor matmul) vs the SAME draw recomputed in float64 on the
     host with identical normals: max/rms error in units of the nominal
     noise STD. This is what bounds the sampler's numerical contribution to
     effective noise at DISTINCT x (the duplicate-pair test cancels the
     latent entirely, so it only sees the observation noise).

Writes docs/results/grid_fidelity.json. Run on the TPU (the f32 matmul under
test is the TPU's); pass --cpu for a host-only smoke run.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=8192)
    p.add_argument("--bptt", type=int, default=2010)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--method", default="fft", choices=["fft", "chol"])
    p.add_argument("--out", default="docs/results/grid_fidelity.json")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    from pfn_tpu.ops.gp_sample import (
        _grid_factor,
        _grid_latent_fft,
        gp_sample_paths_grid,
    )

    HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)

    # --- 1. duplicate-pair effective-noise estimate -------------------------
    x, y = jax.jit(
        lambda k: gp_sample_paths_grid(
            k, args.batch, args.bptt, args.grid,
            HP["lengthscale"], HP["outputscale"], HP["noise"],
            method=args.method,
        )
    )(jax.random.PRNGKey(0))
    x = np.asarray(x)[..., 0]  # (B, T) grid values
    y = np.asarray(y)
    diffs = []
    for b in range(args.batch):
        order = np.argsort(x[b], kind="stable")
        xs, ys_ = x[b][order], y[b][order]
        same = xs[1:] == xs[:-1]  # adjacent duplicates after the sort
        diffs.append((ys_[1:] - ys_[:-1])[same])
    d = np.concatenate(diffs)
    n_pairs = int(d.size)
    # y_i - y_j for identical x is N(0, 2*noise_eff)
    noise_eff = float(np.mean(d**2) / 2.0)
    # chi^2 95% band on the estimate
    rel_hw = 1.96 * np.sqrt(2.0 / max(n_pairs, 1))

    # --- 2. latent f32-vs-f64 error ------------------------------------------
    # Recompute the IDENTICAL latent draw in float64 on the host (jax PRNG
    # bits are backend-deterministic, so the f32 normals match exactly) and
    # compare against the on-device f32 path actually used in training.
    k_lat = jax.random.PRNGKey(1)
    if args.method == "fft":
        f32 = np.asarray(
            jax.jit(
                lambda k: _grid_latent_fft(
                    k, 8, args.grid, HP["lengthscale"], HP["outputscale"]
                )
            )(k_lat),
            np.float64,
        )
        # f64 host reference with the same normals.
        G = args.grid
        h = 1.0 / (G - 1)
        M = 1
        while M < 8 * G:
            M *= 2
        j = np.arange(M)
        d = np.minimum(j, M - j) * h
        c = HP["outputscale"] * np.exp(-0.5 * (d / HP["lengthscale"]) ** 2)
        sqrt_lam = np.sqrt(np.maximum(np.fft.fft(c).real, 0.0))
        n_complex = (8 + 1) // 2
        ka, kb = jax.random.split(k_lat)
        a = np.asarray(jax.random.normal(ka, (n_complex, M), dtype=jnp.float32),
                       np.float64)
        b = np.asarray(jax.random.normal(kb, (n_complex, M), dtype=jnp.float32),
                       np.float64)
        w = np.fft.ifft(sqrt_lam * (a + 1j * b), axis=-1) * np.sqrt(M)
        f64 = np.concatenate([w.real, w.imag], axis=0)[:8, :G]
    else:
        _, L32 = _grid_factor(args.grid, HP["lengthscale"], HP["outputscale"])
        L64 = np.asarray(L32, np.float64)  # measure the MATMUL's added error
        z = np.asarray(
            jax.random.normal(k_lat, (8, args.grid)), np.float64
        )
        f64 = z @ L64.T
        f32 = np.asarray(
            jax.jit(
                lambda zz, ll: jax.lax.dot_general(
                    zz, ll, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                )
            )(jnp.asarray(z, jnp.float32), L32),
            np.float64,
        )
    err = f32 - f64
    noise_sd = float(np.sqrt(HP["noise"]))
    out = {
        "grid": args.grid,
        "bptt": args.bptt,
        "batch": args.batch,
        "method": args.method,
        "backend": jax.default_backend(),
        "nominal_noise": HP["noise"],
        "duplicate_pairs": n_pairs,
        "effective_noise": noise_eff,
        "effective_noise_ci95": [noise_eff * (1 - rel_hw),
                                 noise_eff * (1 + rel_hw)],
        "latent_err_rms": float(np.sqrt(np.mean(err**2))),
        "latent_err_max": float(np.abs(err).max()),
        "latent_err_rms_over_noise_sd": float(
            np.sqrt(np.mean(err**2)) / noise_sd
        ),
        "verdict": (
            "nominal"
            if abs(noise_eff - HP["noise"]) <= rel_hw * HP["noise"]
            and np.sqrt(np.mean(err**2)) < 0.1 * noise_sd
            else "inflated"
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

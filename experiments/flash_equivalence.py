"""On-chip flash-kernel equivalence check (committed artifact).

Runs the COMPILED Pallas PFN flash-attention kernel against the dense jnp
reference path on the real TPU — fwd and bwd — across sequence lengths,
eval positions (including tile-boundary cases), and dtypes, and writes the
measured error table to docs/results/flash_equiv_tpu.json. The hermetic test
suite only exercises the kernel in interpreter mode on CPU
(tests/test_flash_attention.py); this script is the evidence that the
compiled kernel matches on hardware (SURVEY.md §4 item e).

    python experiments/flash_equivalence.py
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.ops.attention import pfn_attention_reference
from pfn_tpu.ops.flash_attention import pfn_flash_attention

# Both paths use TPU default-precision matmuls (bf16-based passes even for
# f32 inputs), so they are compared against a HIGHEST-precision dense gold
# reference. Pass = the flash kernel's error vs gold is within an absolute
# floor OR within 3x the dense path's own error vs gold (i.e. the kernel is
# as accurate as what XLA produces for the same math).
ABS_FLOOR = {"float32": 2e-3, "bfloat16": 2e-2}
REL_FACTOR = 3.0


def _gold_attention(q, k, v, sep, scale=None):
    # Same math as pfn_attention_reference but f32 inputs and HIGHEST
    # matmul precision: the on-chip gold standard.
    with jax.default_matmul_precision("highest"):
        return pfn_attention_reference(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), sep, scale=scale,
        )


def _loss(fn, q, k, v, sep, ct):
    return jnp.sum(fn(q, k, v, sep).astype(jnp.float32) * ct.astype(jnp.float32))


# sep and ct are jit ARGUMENTS (not closures) so each (shape, dtype) combo
# compiles once and is reused across all sep cases — compile time dominates
# the T=2010 cases otherwise.
_flash_fwd = jax.jit(pfn_flash_attention)
_dense_fwd = jax.jit(pfn_attention_reference)
_gold_fwd = jax.jit(_gold_attention)
_flash_grad = jax.jit(jax.grad(lambda q, k, v, sep, ct: _loss(pfn_flash_attention, q, k, v, sep, ct), argnums=(0, 1, 2)))
_dense_grad = jax.jit(jax.grad(lambda q, k, v, sep, ct: _loss(pfn_attention_reference, q, k, v, sep, ct), argnums=(0, 1, 2)))
_gold_grad = jax.jit(jax.grad(lambda q, k, v, sep, ct: _loss(_gold_attention, q, k, v, sep, ct), argnums=(0, 1, 2)))


def run_case(B, H, T, D, sep, dtype, key):
    kq, kk, kv, kg = jax.random.split(key, 4)
    shape = (B, H, T, D)
    q = jax.random.normal(kq, shape, jnp.float32).astype(dtype)
    k = jax.random.normal(kk, shape, jnp.float32).astype(dtype)
    v = jax.random.normal(kv, shape, jnp.float32).astype(dtype)
    ct = jax.random.normal(kg, shape, jnp.float32).astype(dtype)
    sep = jnp.asarray(sep, jnp.int32)

    of, od, og = (_flash_fwd(q, k, v, sep), _dense_fwd(q, k, v, sep),
                  _gold_fwd(q, k, v, sep))
    gf = _flash_grad(q, k, v, sep, ct)
    gd = _dense_grad(q, k, v, sep, ct)
    gg = _gold_grad(q, k, v, sep, ct)

    def err(a, b):
        return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))

    fwd_flash, fwd_dense = err(of, og), err(od, og)

    def grad_rel_err(ga, gb):
        # Grad magnitudes grow with T (the cotangent sum couples all rows);
        # normalize by the gold grad scale so the tolerance is scale-free.
        rels = []
        for a, b in zip(ga, gb):
            scale_ = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) or 1.0
            rels.append(err(a, b) / scale_)
        return max(rels)

    bwd_flash, bwd_dense = grad_rel_err(gf, gg), grad_rel_err(gd, gg)
    floor = ABS_FLOOR[str(dtype)]
    ok = (
        fwd_flash <= max(floor, REL_FACTOR * fwd_dense)
        and bwd_flash <= max(floor, REL_FACTOR * bwd_dense)
    )
    return {
        "B": B, "H": H, "T": T, "D": D, "sep": int(sep), "dtype": str(dtype),
        "fwd_flash_vs_gold": fwd_flash, "fwd_dense_vs_gold": fwd_dense,
        "bwd_flash_vs_gold": bwd_flash, "bwd_dense_vs_gold": bwd_dense,
        "pass": bool(ok),
    }


def run_sharded(cases, out_path):
    """Pallas prefix kernel INSIDE shard_map on the real chip (1-device
    ('dp','sp','tp','ep') mesh — the manual-partition lowering a multi-chip
    sp run uses; multi-device composition is CPU-mesh-tested in
    tests/test_sharding.py with the dense prefix math)."""
    from pfn_tpu.parallel import make_mesh
    from pfn_tpu.ops.attention import pfn_sharded_attention

    mesh = make_mesh(dp=1, devices=jax.devices()[:1])

    def sharded(q, k, v, sep):
        return pfn_sharded_attention(q, k, v, sep, mesh, prefix_impl="flash")

    s_fwd = jax.jit(sharded)
    s_grad = jax.jit(jax.grad(
        lambda q, k, v, sep, ct: _loss(sharded, q, k, v, sep, ct),
        argnums=(0, 1, 2),
    ))
    results = []
    key = jax.random.PRNGKey(17)
    for i, (B, H, T, D, sep) in enumerate(cases):
        kq, kk, kv, kg = jax.random.split(jax.random.fold_in(key, i), 4)
        shape = (B, H, T, D)
        q = jax.random.normal(kq, shape)
        k = jax.random.normal(kk, shape)
        v = jax.random.normal(kv, shape)
        ct = jax.random.normal(kg, shape)
        sep = jnp.asarray(sep, jnp.int32)
        og, os_ = _gold_fwd(q, k, v, sep), s_fwd(q, k, v, sep)
        od = _dense_fwd(q, k, v, sep)
        gg = _gold_grad(q, k, v, sep, ct)
        gs = s_grad(q, k, v, sep, ct)
        gd = _dense_grad(q, k, v, sep, ct)

        def _max_err(a, b):
            return float(jnp.max(jnp.abs(a - b)))

        def _rel_err(ga, gb):
            return max(
                _max_err(a, b) / (float(jnp.max(jnp.abs(b))) or 1.0)
                for a, b in zip(ga, gb)
            )

        fwd, fwd_dense = _max_err(os_, og), _max_err(od, og)
        bwd, bwd_dense = _rel_err(gs, gg), _rel_err(gd, gg)
        # Same criterion as run_case: the sharded composition passes if its
        # error vs the HIGHEST-precision gold is within an absolute floor OR
        # within REL_FACTOR x the default-precision XLA dense path's own
        # error (both paths use TPU default matmul passes; the merge algebra
        # itself is exact — 5e-7 vs the reference on CPU f32).
        floor = ABS_FLOOR["float32"]
        ok = (fwd <= max(floor, REL_FACTOR * fwd_dense)
              and bwd <= max(floor, REL_FACTOR * bwd_dense))
        results.append({"B": B, "H": H, "T": T, "D": D, "sep": int(sep),
                        "fwd_vs_gold": fwd, "fwd_dense_vs_gold": fwd_dense,
                        "bwd_vs_gold": bwd, "bwd_dense_vs_gold": bwd_dense,
                        "pass": bool(ok)})
        print(f"sharded T={T:5d} sep={int(sep):5d} fwd={fwd:.2e} "
              f"(dense {fwd_dense:.2e}) bwd={bwd:.2e} "
              f"(dense {bwd_dense:.2e}) {'ok' if ok else 'FAIL'}")
    out = {"backend": jax.default_backend(),
           "all_pass": all(r["pass"] for r in results), "cases": results}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"all_pass={out['all_pass']} -> {out_path}")
    if not out["all_pass"]:
        raise SystemExit(1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/results/flash_equiv_tpu.json")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--sharded", action="store_true",
                   help="test the kernel inside shard_map (1-device mesh) "
                        "instead; writes docs/results/flash_shard_tpu.json")
    args = p.parse_args()
    if args.sharded:
        run_sharded(
            [(2, 4, 256, 128, 100), (2, 4, 512, 128, 300),
             (4, 4, 2010, 128, 1200)],
            "docs/results/flash_shard_tpu.json",
        )
        return

    backend = jax.default_backend()
    print(f"backend: {backend}")
    # Cases: short/long T, sep below/at/above the 128 and 256 tile
    # boundaries, last-position sep, both compute dtypes.
    cases = [
        (2, 4, 256, 128, 1), (2, 4, 256, 128, 127), (2, 4, 256, 128, 128),
        (2, 4, 256, 128, 129), (2, 4, 256, 128, 255),
        (2, 4, 512, 128, 256), (2, 4, 512, 128, 300),
        (4, 4, 2010, 128, 200), (4, 4, 2010, 128, 1200),
        (4, 4, 2010, 128, 2009),
    ]
    if args.quick:
        cases = cases[:4]
    results = []
    key = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        for i, (B, H, T, D, sep) in enumerate(cases):
            r = run_case(B, H, T, D, sep, jnp.dtype(dtype).name, jax.random.fold_in(key, i))
            results.append(r)
            print(
                f"T={r['T']:5d} sep={r['sep']:5d} {r['dtype']:9s} "
                f"fwd flash/dense={r['fwd_flash_vs_gold']:.2e}/"
                f"{r['fwd_dense_vs_gold']:.2e} "
                f"bwd flash/dense={r['bwd_flash_vs_gold']:.2e}/"
                f"{r['bwd_dense_vs_gold']:.2e} {'ok' if r['pass'] else 'FAIL'}"
            )
    out = {
        "backend": backend,
        "tolerances": {"abs_floor": ABS_FLOOR, "rel_factor": REL_FACTOR},
        "all_pass": all(r["pass"] for r in results),
        "cases": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"all_pass={out['all_pass']} -> {args.out}")
    if not out["all_pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

"""Sweep fused-batch x grad-accum shapes for the bptt=2010 Fig-3a config.

The reference trains bptt=2010 with batch 4 x aggregate_k 25 (notebook
SetupForGPFittingExperiments cell 5) — a shape forced by its GPU
materializing (B, H, T, T) attention scores. The Pallas flash kernel removes
that constraint, so larger fused batches should win on TPU. This sweep keeps
the OPTIMIZATION SCHEDULE invariant — effective batch 100 datasets/update,
4 updates/epoch, 400 datasets/epoch — and varies only how the 100 datasets
are split into microbatches:

    (B=4,  agg=25)  (B=10, agg=10)  (B=20, agg=5)
    (B=25, agg=4)   (B=50, agg=2)   (B=100, agg=1)

Each config times one epoch-equivalent (4 updates) after a compile warmup.
Writes results/batch_sweep.json with per-config s/epoch and the winner;
fig3a_longrun.py exposes --batch_size/--agg to adopt it.
"""

from __future__ import annotations

import argparse
import json
import os
import time


GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
SHAPES = [(4, 25), (10, 10), (20, 5), (25, 4), (50, 2), (100, 1)]


def time_config(batch_size: int, agg: int, bptt: int, epochs_timed: int = 2):
    import jax
    import jax.numpy as jnp
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.priors.base import sample_y_for_buckets
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, full_support_bar_criterion
    from pfn_tpu.train.loop import (
        TrainState,
        _make_optimizer,
        build_model,
        make_train_step,
    )
    from pfn_tpu.models.transformer import num_params

    prior = GPPrior(num_features=1, **GP_HP)
    ys = sample_y_for_buckets(prior, 100_000, bptt, seed=7)
    crit = full_support_bar_criterion(get_bucket_limits(1000, ys=ys))
    cfg = TrainConfig(
        emsize=512, nhid=1024, nlayers=6, nhead=4, bptt=bptt,
        batch_size=batch_size, aggregate_k_gradients=agg,
        steps_per_epoch=4 * agg, epochs=1, lr=1e-4, warmup_epochs=1,
        eval_pos_sampler="weighted", eval_pos_max=min(2000, bptt),
        dtype=jnp.bfloat16, verbose=False,
    )
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=bptt)
    tx, _, _ = _make_optimizer(cfg, num_params(params))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(model, prior, crit, cfg, tx),
                      donate_argnums=0)

    key = jax.random.PRNGKey(1)
    # Warmup: compile + one steady-state update.
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub)
    loss = float(metrics["loss"])  # real sync (block_until_ready can no-op)
    assert loss == loss, "non-finite warmup loss"

    updates = 4 * epochs_timed  # 4 updates per epoch-equivalent
    t0 = time.perf_counter()
    for _ in range(updates):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub)
    loss = float(metrics["loss"])  # sync inside timed region
    dt = time.perf_counter() - t0
    assert loss == loss, "non-finite timed loss"
    return dt / epochs_timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bptt", type=int, default=2010)
    p.add_argument("--out", default="results/batch_sweep.json")
    p.add_argument("--shapes", default=None,
                   help="comma list like 4x25,20x5 (default: full sweep)")
    args = p.parse_args()

    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(map(int, s.split("x"))) for s in args.shapes.split(",")]

    # Resume-friendly: merge into an existing result file and skip shapes
    # already timed, so the supervisor can run one shape per process (an OOM
    # or backend wobble in one config can't poison the rest).
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("s_per_epoch", {})
    for batch_size, agg in shapes:
        name = f"{batch_size}x{agg}"
        if isinstance(results.get(name), float):
            print(f"{name}: cached {results[name]} s/epoch", flush=True)
            continue
        try:
            s_per_epoch = time_config(batch_size, agg, args.bptt)
            results[name] = round(s_per_epoch, 3)
            print(f"{name}: {s_per_epoch:.2f} s/epoch", flush=True)
        except Exception as e:  # OOM etc: record and continue the sweep
            results[name] = f"failed: {type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
        _write(args, results)
    print(json.dumps(_write(args, results)))


def _write(args, results):
    ok = {k: v for k, v in results.items() if isinstance(v, float)}
    payload = {
        "bptt": args.bptt,
        "schedule_invariant": "100 datasets/update, 4 updates/epoch",
        "s_per_epoch": results,
        "winner": min(ok, key=ok.get) if ok else None,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    return payload


if __name__ == "__main__":
    main()

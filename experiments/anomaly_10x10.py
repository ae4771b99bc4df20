"""Isolate the 10x10 batch-shape anomaly (round-3 VERDICT weakness 5).

The bptt=2010 sweep (docs/results/batch_sweep_2010.json) measured the
microbatch-10 x accum-10 shape SLOWER (5.69 s/epoch) than microbatch-4 x
accum-25 (4.76) even though larger microbatches otherwise win (20x5: 3.99,
25x4: 3.98). docs/PERF.md hypothesized the flash kernel's 128->256 tile
switch at B*H=64 — but BOTH 4x25 and 10x10 sit below the switch (B*H=16/40,
block 128), so the hypothesis needs a direct test.

This driver, in ONE process back-to-back (the only timing regime the tunnel
makes trustworthy — docs/PERF.md "timing variance"):

  1. times the full fused train step for shapes 4x25 / 10x10 / 20x5 with the
     flash tile FORCED to 128 and to 256 (monkeypatching
     flash_attention._choose_block), schedule invariant at 100
     datasets/update, 4 updates/epoch;
  2. decomposes per-100-datasets cost into attention-only (flash fwd+bwd,
     agg repeats of the microbatch) and GP-prior-sample-only, per
     microbatch size.

Writes results/anomaly_10x10.json; the PERF.md paragraph replacing
"measured, not explained" cites it.
"""

from __future__ import annotations

import argparse
import json
import os
import time

GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
STEP_SHAPES = [(4, 25), (10, 10), (20, 5)]
ATTN_BATCHES = [4, 10, 20, 25]


def _force_block(block: int | None):
    from pfn_tpu.ops import flash_attention as fa

    if not hasattr(fa, "_choose_block_orig"):
        fa._choose_block_orig = fa._choose_block
    fa._choose_block = (
        fa._choose_block_orig if block is None else (lambda *a: block)
    )


def time_step(batch_size: int, agg: int, bptt: int, block: int | None,
              epochs_timed: int = 2) -> float:
    """Full-train-step s/epoch; same machinery as batch_shape_sweep."""
    import jax
    import jax.numpy as jnp
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.models.transformer import num_params
    from pfn_tpu.priors.base import sample_y_for_buckets
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, full_support_bar_criterion
    from pfn_tpu.train.loop import (
        TrainState,
        _make_optimizer,
        build_model,
        make_train_step,
    )

    _force_block(block)
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
    for _ in range(2):  # compile + steady-state warmup
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub)
    assert float(metrics["loss"]) == float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(4 * epochs_timed):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub)
    loss = float(metrics["loss"])  # sync inside timed region
    dt = time.perf_counter() - t0
    assert loss == loss
    return dt / epochs_timed


def time_attention(batch: int, bptt: int, block: int | None,
                   nhead: int = 4, d: int = 128, reps_timed: int = 3) -> float:
    """Flash fwd+bwd seconds per 100 datasets (agg = 100/batch repeats)."""
    import jax
    import jax.numpy as jnp
    from pfn_tpu.ops.flash_attention import pfn_flash_attention

    _force_block(block)
    agg = 100 // batch
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, nhead, bptt, d), jnp.bfloat16)
    k = jax.random.normal(kk, (batch, nhead, bptt, d), jnp.bfloat16)
    v = jax.random.normal(kv, (batch, nhead, bptt, d), jnp.bfloat16)

    def fwd_bwd(q, k, v, sep):
        def loss(q, k, v):
            return pfn_flash_attention(q, k, v, sep).astype(jnp.float32).sum()

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        return l, grads

    fn = jax.jit(fwd_bwd)
    sep = jnp.asarray(1000, jnp.int32)
    l, _ = fn(q, k, v, sep)
    float(l)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps_timed * agg):
        l, grads = fn(q, k, v, sep)
    float(l)
    float(grads[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / reps_timed


def time_prior(batch: int, bptt: int, reps_timed: int = 3) -> float:
    """GP prior sample seconds per 100 datasets (agg repeats of batch)."""
    import jax
    import jax.numpy as jnp
    from pfn_tpu.priors.gp import GPPrior

    agg = 100 // batch
    prior = GPPrior(num_features=1, **GP_HP)
    fn = jax.jit(lambda k: prior.sample(k, batch, bptt))
    key = jax.random.PRNGKey(0)
    x, y, _ = fn(key)
    float(jnp.asarray(y).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for i in range(reps_timed * agg):
        x, y, _ = fn(jax.random.fold_in(key, i))
    float(jnp.asarray(y).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / reps_timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bptt", type=int, default=2010)
    p.add_argument("--out", default="results/anomaly_10x10.json")
    p.add_argument("--phase", default="all",
                   choices=["all", "step", "attn", "prior"])
    args = p.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results.setdefault("bptt", args.bptt)
    results.setdefault("step_s_per_epoch", {})
    results.setdefault("attn_s_per_100ds", {})
    results.setdefault("prior_s_per_100ds", {})

    def save():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    if args.phase in ("all", "step"):
        for b, agg in STEP_SHAPES:
            for block in (128, 256):
                name = f"{b}x{agg}_block{block}"
                if name in results["step_s_per_epoch"]:
                    continue
                try:
                    s = time_step(b, agg, args.bptt, block)
                    results["step_s_per_epoch"][name] = round(s, 3)
                    print(f"step {name}: {s:.2f} s/epoch", flush=True)
                except Exception as e:
                    results["step_s_per_epoch"][name] = (
                        f"failed: {type(e).__name__}: {str(e)[:160]}")
                    print(f"step {name}: FAILED {type(e).__name__}",
                          flush=True)
                save()

    if args.phase in ("all", "attn"):
        for b in ATTN_BATCHES:
            for block in (128, 256):
                name = f"B{b}_block{block}"
                if name in results["attn_s_per_100ds"]:
                    continue
                try:
                    s = time_attention(b, args.bptt, block)
                    results["attn_s_per_100ds"][name] = round(s, 4)
                    print(f"attn {name}: {s:.3f} s/100ds", flush=True)
                except Exception as e:
                    results["attn_s_per_100ds"][name] = (
                        f"failed: {type(e).__name__}: {str(e)[:160]}")
                    print(f"attn {name}: FAILED {type(e).__name__}",
                          flush=True)
                save()

    if args.phase in ("all", "prior"):
        for b in ATTN_BATCHES:
            name = f"B{b}"
            if name in results["prior_s_per_100ds"]:
                continue
            try:
                s = time_prior(b, args.bptt)
                results["prior_s_per_100ds"][name] = round(s, 4)
                print(f"prior {name}: {s:.3f} s/100ds", flush=True)
            except Exception as e:
                results["prior_s_per_100ds"][name] = (
                    f"failed: {type(e).__name__}: {str(e)[:160]}")
                print(f"prior {name}: FAILED {type(e).__name__}", flush=True)
            save()

    save()
    print(json.dumps(results))


if __name__ == "__main__":
    main()

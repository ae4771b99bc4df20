"""Break down the fused train step's time: prior sampling vs forward vs
forward+backward vs full update vs optimizer-only, plus a bf16 matmul
roofline fraction. Defaults profile the bench config (B=64, bptt=100,
Fig-3a arch); ``--bptt 2010 --batch_size 4 --grid 8192 --num_buckets
10000`` profiles the Fig-3a long-sequence microbatch (VERDICT-4 task 9).
Back-to-back in one process (tunnel timing rules: materialize a value
inside the timed region)."""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from pfn_tpu.distributions import get_bucket_limits
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.train import TrainConfig, bar_criterion
from pfn_tpu.train.loop import (
    TrainState,
    _make_optimizer,
    build_model,
    make_train_step,
)
from pfn_tpu.models.transformer import num_params

GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
PEAK_BF16_TFLOPS = 197.0  # TPU v5e (lite) bf16 MXU peak, per chip


def timeit(name, fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # force real sync (tunnel): materialize a scalar
    float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bptt", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--grid", type=int, default=0,
                    help="G > 0: profile the grid/FFT prior sampler path")
    ap.add_argument("--num_buckets", type=int, default=100)
    ap.add_argument("--out", default=None,
                    help="also write the breakdown + roofline JSON here")
    args = ap.parse_args()
    B, T = args.batch_size, args.bptt

    prior = GPPrior(num_features=1, grid=args.grid, **GP_HP)
    crit = bar_criterion(
        get_bucket_limits(args.num_buckets, full_range=(-4.0, 4.0))
    )
    cfg = TrainConfig(
        emsize=512, nhid=1024, nlayers=6, nhead=4, batch_size=B, bptt=T,
        lr=1e-4, warmup_epochs=1, epochs=1, steps_per_epoch=20,
        dtype=jnp.bfloat16,
    )
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=T)
    tx, _, _ = _make_optimizer(cfg, num_params(params))
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)
    res = {"bptt": T, "batch_size": B, "grid": args.grid,
           "num_buckets": args.num_buckets}

    # 1. prior sampling alone
    sample = jax.jit(lambda k: prior.sample(k, B, T))
    res["prior_sample_ms"] = 1e3 * timeit(
        f"prior.sample ({B}x {'grid-fft' if args.grid else 'chol'} T={T})",
        sample, key)

    # 2. forward only
    x, y, ty = sample(key)
    sep = jnp.asarray(T // 2, jnp.int32)
    fwd = jax.jit(lambda p, x, y, s: model.apply(p, x, y, s))
    res["forward_ms"] = 1e3 * timeit("forward", fwd, params, x, y, sep)

    # 3. loss fwd+bwd (no optimizer)
    def loss_fn(p, x, y, ty, s):
        out = model.apply(p, x, y, s)
        losses = crit.per_position(out, ty)
        mask = (jnp.arange(T)[None, :] >= s).astype(losses.dtype)
        return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    grad = jax.jit(jax.grad(loss_fn))
    res["fwd_bwd_ms"] = 1e3 * timeit("forward+backward", grad, params, x, y,
                                     ty, sep)

    # 4. optimizer update alone (clip + adam on 25M f32 params)
    g = grad(params, x, y, ty, sep)

    def opt_only(g, opt_state, params):
        import optax

        updates, new_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    opt_jit = jax.jit(opt_only)
    res["optimizer_ms"] = 1e3 * timeit("clip+adam update only", opt_jit, g,
                                       opt_state, params)

    # 5. the fused full step (sample + fwd + bwd + update)
    step = jax.jit(
        make_train_step(model, prior, crit, cfg, tx), donate_argnums=0
    )
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))

    # manual loop timing with state threading
    for i in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 30
    for i in range(n):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
    float(m["loss"])
    res["full_step_ms"] = (time.perf_counter() - t0) / n * 1e3
    print(f"{'full fused step':34s} {res['full_step_ms']:8.3f} ms")

    P = num_params(params)
    res["params_m"] = P / 1e6
    print("params:", P / 1e6, "M")

    # bf16 matmul roofline: fwd matmul FLOPs ~= 2*P*B*T (param matmuls)
    # + 4*B*T^2*emsize (QK^T and PV across layers: 2 matmuls * 2 FLOP *
    # nlayers*nhead*dh = emsize per layer... summed = 4*B*T^2*emsize*nlayers
    # / ... computed explicitly below); bwd ~= 2x fwd.
    emsize, nlayers = 512, 6
    attn_flops = 4 * B * T * T * emsize * nlayers  # QK^T + PV, all layers
    param_flops = 2 * P * B * T
    fwd_flops = param_flops + attn_flops
    step_flops = 3 * fwd_flops  # fwd + ~2x for bwd
    res["roofline"] = {
        "peak_bf16_tflops": PEAK_BF16_TFLOPS,
        "fwd_tflop": fwd_flops / 1e12,
        "fwd_pct_of_peak": 100 * fwd_flops / (res["forward_ms"] / 1e3)
        / (PEAK_BF16_TFLOPS * 1e12),
        "fwd_bwd_pct_of_peak": 100 * step_flops / (res["fwd_bwd_ms"] / 1e3)
        / (PEAK_BF16_TFLOPS * 1e12),
        "full_step_pct_of_peak": 100 * step_flops
        / (res["full_step_ms"] / 1e3) / (PEAK_BF16_TFLOPS * 1e12),
    }
    for k, v in res["roofline"].items():
        print(f"{k:34s} {v:8.3f}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

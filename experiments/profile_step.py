"""Break down the fused train step's time at the bench config (B=64,
bptt=100, Fig-3a arch): prior sampling vs forward vs forward+backward vs
full update vs optimizer-only. Back-to-back in one process (tunnel timing
rules: materialize a value inside the timed region)."""

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

B, T = 64, 100
GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)


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
    prior = GPPrior(num_features=1, **GP_HP)
    crit = bar_criterion(get_bucket_limits(100, full_range=(-4.0, 4.0)))
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

    # 1. prior sampling alone
    sample = jax.jit(lambda k: prior.sample(k, B, T))
    timeit("prior.sample (64x chol 100x100)", sample, key)

    # 2. forward only
    x, y, ty = sample(key)
    sep = jnp.asarray(T // 2, jnp.int32)
    fwd = jax.jit(lambda p, x, y, s: model.apply(p, x, y, s))
    timeit("forward", fwd, params, x, y, sep)

    # 3. loss fwd+bwd (no optimizer)
    def loss_fn(p, x, y, ty, s):
        out = model.apply(p, x, y, s)
        losses = crit.per_position(out, ty)
        mask = (jnp.arange(T)[None, :] >= s).astype(losses.dtype)
        return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    grad = jax.jit(jax.grad(loss_fn))
    timeit("forward+backward", grad, params, x, y, ty, sep)

    # 4. optimizer update alone (clip + adam on 25M f32 params)
    g = grad(params, x, y, ty, sep)

    def opt_only(g, opt_state, params):
        import optax

        updates, new_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    opt_jit = jax.jit(opt_only)
    timeit("clip+adam update only", opt_jit, g, opt_state, params)

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
    print(f"{'full fused step':34s} {(time.perf_counter() - t0) / n * 1e3:8.3f} ms")

    print("params:", num_params(params) / 1e6, "M")


if __name__ == "__main__":
    main()

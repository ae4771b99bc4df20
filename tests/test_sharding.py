"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
TPU-native stand-in for multi-chip validation (SURVEY.md §4 item f)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.parallel import make_mesh, param_sharding
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.train import TrainConfig, gaussian_nll_criterion, train


def small_cfg(**kw):
    base = dict(
        emsize=32,
        nhid=64,
        nlayers=2,
        nhead=4,
        epochs=1,
        steps_per_epoch=4,
        batch_size=16,
        bptt=10,
        lr=1e-3,
        warmup_epochs=1,
        verbose=False,
        attention_impl="dense",
        seed=3,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_mesh_construction(eight_devices):
    mesh = make_mesh()
    assert mesh.shape == {"dp": 8, "sp": 1, "tp": 1, "ep": 1}
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "sp": 1, "tp": 2, "ep": 1}
    mesh = make_mesh(dp=2, sp=2, tp=2)
    assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2, "ep": 1}
    mesh = make_mesh(dp=2, ep=4)
    assert mesh.shape == {"dp": 2, "sp": 1, "tp": 1, "ep": 4}


def test_param_sharding_rules(eight_devices):
    from pfn_tpu.train.loop import build_model

    mesh = make_mesh(dp=4, tp=2)
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    model = build_model(prior, crit, small_cfg())
    params = model.init_params(jax.random.PRNGKey(0), seq_len=10)
    shardings = param_sharding(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {
        "/".join(str(getattr(p, "key", p)) for p in path): s.spec
        for path, s in flat
    }
    qkv = [v for k, v in specs.items() if "qkv" in k and k.endswith("kernel")]
    assert all(spec == jax.sharding.PartitionSpec(None, "tp") for spec in qkv)
    outp = [v for k, v in specs.items() if "out_proj" in k and k.endswith("kernel")]
    assert all(spec == jax.sharding.PartitionSpec("tp", None) for spec in outp)


def test_dp_training_runs_and_matches_single_device(eight_devices):
    """The sharded train step must produce the same math as single-device
    (same PRNG keys -> same data -> same updates, modulo float reassociation)."""
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    res_single = train(prior, crit, small_cfg())
    mesh = make_mesh()  # dp=8
    res_dp = train(prior, crit, small_cfg(), mesh=mesh)
    l_single = jax.tree_util.tree_leaves(res_single.params)
    l_dp = jax.tree_util.tree_leaves(res_dp.params)
    for a, b in zip(l_single, l_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dp_tp_training_runs(eight_devices):
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    mesh = make_mesh(dp=4, tp=2)
    res = train(prior, crit, small_cfg(), mesh=mesh)
    assert np.isfinite(res.final_loss)


@pytest.mark.parametrize("impl", ["dense", "flash"])
def test_sp_training_matches_single_device(eight_devices, impl):
    """Sequence-parallel activations (dp=2, sp=2, tp=2): same PRNG keys ->
    same math as the single-device run, modulo float reassociation.

    impl='flash' routes attention through the shard_map prefix+merge path
    (ops.attention.pfn_sharded_attention) — the composition a real multi-chip
    bptt=2010 run uses; on the CPU mesh the prefix pass is the dense jnp
    implementation with identical semantics to the Pallas kernel."""
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    res_single = train(prior, crit, small_cfg())
    mesh = make_mesh(dp=2, sp=2, tp=2)
    res_sp = train(prior, crit, small_cfg(attention_impl=impl), mesh=mesh)
    for a, b in zip(
        jax.tree_util.tree_leaves(res_single.params),
        jax.tree_util.tree_leaves(res_sp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("sep", [0, 64, 100, 256])
def test_sharded_attention_matches_reference(eight_devices, sep):
    """pfn_sharded_attention (shard_map over dp/sp/tp, K/V all-gather over
    'sp', prefix+self-merge) == the dense reference on a full-size array."""
    from pfn_tpu.ops.attention import (
        pfn_attention_reference,
        pfn_sharded_attention,
    )

    mesh = make_mesh(dp=2, sp=2, tp=2)
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (4, 4, 256, 64)) for kk in jax.random.split(key, 3)
    )
    want = pfn_attention_reference(q, k, v, jnp.asarray(sep))
    got = pfn_sharded_attention(q, k, v, jnp.asarray(sep), mesh, prefix_impl="dense")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_sharded_attention_gradients_match_reference(eight_devices):
    """Backward through shard_map + all_gather + prefix merge must equal the
    dense reference's gradients (AD transposes the all_gather into a
    reduce_scatter over 'sp')."""
    from pfn_tpu.ops.attention import (
        pfn_attention_reference,
        pfn_sharded_attention,
    )

    mesh = make_mesh(dp=2, sp=2, tp=2)
    key = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(kk, (2, 2, 128, 32)) for kk in jax.random.split(key, 3)
    )
    w = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 128, 32))
    sep = jnp.asarray(77)

    def loss_sharded(q, k, v):
        return jnp.sum(
            w * pfn_sharded_attention(q, k, v, sep, mesh, prefix_impl="dense")
        )

    def loss_ref(q, k, v):
        return jnp.sum(w * pfn_attention_reference(q, k, v, sep))

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gs, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_fsdp_param_sharding_rules(eight_devices):
    from pfn_tpu.train.loop import build_model

    mesh = make_mesh(dp=4, tp=2)
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    model = build_model(prior, crit, small_cfg())
    params = model.init_params(jax.random.PRNGKey(0), seq_len=10)
    shardings = param_sharding(params, mesh, fsdp=True)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {
        "/".join(str(getattr(p, "key", p)) for p in path): s.spec
        for path, s in flat
    }
    qkv = [v for k, v in specs.items() if "qkv" in k and k.endswith("kernel")]
    assert all(spec == jax.sharding.PartitionSpec("dp", "tp") for spec in qkv)
    outp = [v for k, v in specs.items() if "out_proj" in k and k.endswith("kernel")]
    assert all(spec == jax.sharding.PartitionSpec("tp", "dp") for spec in outp)
    # A kernel untouched by tp rules (the x-encoder: (F=1, emsize=32)) must
    # still shard its larger (divisible) dim over 'dp'.
    enc = {k: v for k, v in specs.items() if "encoder" in k and k.endswith("kernel")}
    assert enc and all("dp" in spec for spec in enc.values())


def test_fsdp_training_matches_single_device(eight_devices):
    """ZeRO-3 param sharding must not change the math."""
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    res_single = train(prior, crit, small_cfg())
    mesh = make_mesh()  # dp=8
    res_fsdp = train(prior, crit, small_cfg(fsdp=True), mesh=mesh)
    for a, b in zip(
        jax.tree_util.tree_leaves(res_single.params),
        jax.tree_util.tree_leaves(res_fsdp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_tp_requires_divisible_nhead(eight_devices):
    """nhead % tp must fail fast at train() — a silent dense fallback every
    step would defeat the sharded flash path (review finding, round 3)."""
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    mesh = make_mesh(dp=2, tp=4)
    with pytest.raises(AssertionError, match="nhead"):
        train(prior, crit, small_cfg(nhead=2), mesh=mesh)


def test_sharded_flash_train_step_traces_at_bptt2010(eight_devices, monkeypatch):
    """jax.eval_shape of the sp-sharded bptt=2010 train step with the
    PALLAS prefix kernel selected (backend spoofed to 'tpu'): validates the
    shard_map + flash custom_vjp contract at the real long-context shape
    without executing a single FLOP — the composition a multi-chip Fig-3a
    run compiles."""
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.train import bar_criterion
    from pfn_tpu.train.loop import (
        TrainState,
        _make_optimizer,
        build_model,
        make_train_step,
    )

    mesh = make_mesh(dp=2, sp=2, tp=2)
    prior = GPPrior(num_features=1, grid=2048)
    crit = bar_criterion(get_bucket_limits(100, full_range=(-4.0, 4.0)))
    cfg = TrainConfig(
        emsize=512, nhid=1024, nlayers=6, nhead=4, batch_size=4, bptt=2010,
        lr=1e-4, warmup_epochs=1, epochs=1, steps_per_epoch=1,
        dtype=jnp.bfloat16, attention_impl="flash",
    )
    model = build_model(prior, crit, cfg, mesh=mesh)
    params = jax.eval_shape(
        lambda k: model.init_params(k, seq_len=16), jax.random.PRNGKey(0)
    )
    tx, _, _ = _make_optimizer(cfg, 19_000_000)
    opt_state = jax.eval_shape(tx.init, params)
    state = jax.eval_shape(
        lambda p, o: TrainState(
            params=p, opt_state=o, step=jnp.zeros((), jnp.int32)
        ),
        params, opt_state,
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    step = make_train_step(model, prior, crit, cfg, tx, mesh=mesh)
    _, metrics = jax.eval_shape(step, state, jax.random.PRNGKey(1))
    assert metrics["loss"].shape == ()

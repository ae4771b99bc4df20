"""MoE FFN + expert parallelism: E=1 must reduce exactly to the dense FFN
math, routing must respect capacity, ep-sharded training must match the
unsharded run, and the aux loss must be collected."""

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.models.moe import MoEFFN
from pfn_tpu.parallel import make_mesh, param_sharding
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.train import TrainConfig, gaussian_nll_criterion, train


def test_single_expert_equals_dense_ffn():
    """E=1, capacity >= T: top-1 routing sends every token to the one expert
    with gate 1.0 -> identical to Linear-GELU-Linear with the same weights."""
    D, H, B, T = 16, 32, 3, 10
    moe = MoEFFN(D, H, num_experts=1, capacity_factor=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    params = {"params": moe.init(jax.random.PRNGKey(1), x)["params"]}
    out, _ = moe.apply(params, x, mutable=["moe_aux"])
    w1 = params["params"]["w1"][0]
    b1 = params["params"]["b1"][0]
    w2 = params["params"]["w2"][0]
    b2 = params["params"]["b2"][0]
    ref = jax.nn.gelu(x @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_capacity_truncation_drops_overflow():
    """With capacity far below T/E, most tokens fall through with output 0."""
    D, H, B, T, E = 8, 16, 2, 32, 2
    moe = MoEFFN(D, H, num_experts=E, capacity_factor=0.1)  # C = 1
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    params = {"params": moe.init(jax.random.PRNGKey(1), x)["params"]}
    # Make expert outputs nonzero (w2 is zero-init): bump it.
    params = jax.tree.map(lambda a: a + 0.1, params)
    out, _ = moe.apply(params, x, mutable=["moe_aux"])
    zero_rows = np.isclose(np.abs(np.asarray(out)).sum(-1), 0.0)
    # At most E*C=2 routed tokens per batch row -> at least T-2 zero rows.
    assert zero_rows.sum(axis=1).min() >= T - E


def test_aux_loss_collected():
    D, H, B, T, E = 8, 16, 2, 12, 4
    moe = MoEFFN(D, H, num_experts=E)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    params = {"params": moe.init(jax.random.PRNGKey(1), x)["params"]}
    _, mut = moe.apply(params, x, mutable=["moe_aux"])
    (aux,) = jax.tree.leaves(mut["moe_aux"])
    # Perfectly balanced top-1 routing gives aux = 1; any routing >= 1.
    assert float(aux) >= 1.0 - 1e-3


def _cfg(**kw):
    base = dict(
        emsize=32, nhid=64, nlayers=2, nhead=4, epochs=1, steps_per_epoch=4,
        batch_size=16, bptt=12, lr=1e-3, warmup_epochs=1, verbose=False,
        attention_impl="dense", num_experts=4, seed=3,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_moe_training_runs_and_learns(eight_devices):
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    res = train(prior, crit, _cfg(epochs=8, steps_per_epoch=16, lr=1e-3))
    assert np.isfinite(res.final_loss)
    first_two = np.mean([s["mean_loss"] for s in res.epoch_stats[:2]])
    last_two = np.mean([s["mean_loss"] for s in res.epoch_stats[-2:]])
    assert last_two < first_two, (first_two, last_two)


def test_ep_training_matches_single_device(eight_devices):
    """Expert-parallel (ep=4, dp=2) must reproduce the unsharded math."""
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    res_single = train(prior, crit, _cfg())
    mesh = make_mesh(dp=2, ep=4)
    res_ep = train(prior, crit, _cfg(), mesh=mesh)
    for a, b in zip(
        jax.tree_util.tree_leaves(res_single.params),
        jax.tree_util.tree_leaves(res_ep.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_ep_param_sharding_rules(eight_devices):
    from pfn_tpu.train.loop import build_model

    mesh = make_mesh(dp=2, ep=4)
    prior = GPPrior(num_features=1)
    crit = gaussian_nll_criterion()
    model = build_model(prior, crit, _cfg(), mesh=mesh)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=12)
    shardings = param_sharding(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    moe_specs = [
        s.spec
        for path, s in flat
        if "moe" in "/".join(str(getattr(p, "key", p)) for p in path)
        and str(getattr(path[-1], "key", path[-1])) in ("w1", "w2", "b1", "b2")
    ]
    assert moe_specs and all(spec[0] == "ep" for spec in moe_specs)

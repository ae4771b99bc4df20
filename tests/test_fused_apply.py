"""Full-model fused fast path (models.fused_apply) vs PFNTransformer.apply.

Eager (non-jit) with interpret=True — jit-of-interpret is impractically
slow, so the jitted fused train step is exercised on the real chip
(experiments/fused_layer_ab.py); this checks the model-level wiring: param
mapping, embed/decoder parity, layer chaining, and gradient flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.models.fused_apply import fused_forward, fused_supported
from pfn_tpu.models.transformer import PFNTransformer, TransformerConfig

pytestmark = pytest.mark.quick


def _cfg(**kw):
    base = dict(
        num_features=2, n_out=10, emsize=32, nhead=2, nhid=48, nlayers=2,
        attention_impl="fused",
    )
    base.update(kw)
    return TransformerConfig(**base)


def _randomized_params(model, key, seq_len=16, scale=0.3):
    p = model.init_params(key, seq_len=seq_len)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(jax.random.fold_in(key, 7), len(leaves))
    leaves = [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_fused_forward_matches_model():
    cfg = _cfg()
    model = PFNTransformer(cfg)
    params = _randomized_params(model, jax.random.PRNGKey(0))
    kx, ky = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 16, 2))
    y = jax.random.normal(ky, (2, 16))
    sep = jnp.asarray(9)
    want = model.apply(params, x, y, sep)
    got = fused_forward(cfg, params, x, y, sep, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5
    )


def test_fused_forward_gradients_match_model():
    cfg = _cfg()
    model = PFNTransformer(cfg)
    params = _randomized_params(model, jax.random.PRNGKey(2))
    kx, ky = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (2, 16, 2))
    y = jax.random.normal(ky, (2, 16))
    sep = jnp.asarray(5)
    w = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 10))

    g_ref = jax.grad(lambda p: jnp.sum(w * model.apply(p, x, y, sep)))(params)
    g_fused = jax.grad(
        lambda p: jnp.sum(w * fused_forward(cfg, p, x, y, sep, interpret=True))
    )(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
    ):
        name = "/".join(str(k) for k in path)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_fused_supported_gates():
    assert fused_supported(_cfg()) is None
    assert "dropout" in fused_supported(_cfg(dropout=0.1))
    assert "MoE" in fused_supported(_cfg(num_experts=2))
    assert "SeqBN" in fused_supported(_cfg(input_normalization=True))
    with pytest.raises(ValueError, match="dropout"):
        cfg = _cfg(dropout=0.1)
        fused_forward(
            cfg, {}, jnp.zeros((1, 4, 2)), jnp.zeros((1, 4)), 2, interpret=True
        )


def test_fused_train_chunk_traces_at_flagship_shape(monkeypatch):
    """jax.eval_shape of the FULL fused train chunk (prior sample + fused
    custom_vjp fwd/bwd + clip + adam, scanned) at the bench flagship shape.
    Zero compute — validates the jit-level contract (residual pytrees,
    scan-of-grad-of-pallas) that the eager parity tests cannot reach and the
    chip A/B would otherwise discover at compile time."""
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, bar_criterion
    from pfn_tpu.train.loop import (
        TrainState,
        _make_optimizer,
        build_model,
        make_train_chunk,
        make_train_step,
    )

    prior = GPPrior(num_features=1, grid=2048, noise=1e-4)
    crit = bar_criterion(get_bucket_limits(100, full_range=(-4.0, 4.0)))
    cfg = TrainConfig(
        emsize=512, nhid=1024, nlayers=6, nhead=4, batch_size=64, bptt=100,
        lr=1e-4, warmup_epochs=1, epochs=1, steps_per_epoch=2,
        dtype=jnp.bfloat16, attention_impl="fused",
    )
    model = build_model(prior, crit, cfg)
    params = jax.eval_shape(
        lambda k: model.init_params(k, seq_len=100), jax.random.PRNGKey(0)
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
    chunk = make_train_chunk(make_train_step(model, prior, crit, cfg, tx), 2)
    out_state, metrics = jax.eval_shape(chunk, state, jax.random.PRNGKey(1))
    assert metrics["loss"].shape == ()
    assert metrics["pos_loss"].shape == (100,)

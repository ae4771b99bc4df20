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

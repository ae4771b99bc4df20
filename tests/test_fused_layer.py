"""Fused encoder-layer Pallas kernel vs the flax PFNEncoderLayer.

Runs the kernels with interpret=True (plain Pallas CPU interpreter, called
eagerly — jit-of-interpret is pathologically slow). Forward AND backward
(custom_vjp with in-VMEM recompute) must match jax.grad through the flax
layer to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.models.transformer import PFNEncoderLayer
from pfn_tpu.ops.fused_layer import fused_encoder_layer

pytestmark = pytest.mark.quick

D, H, F = 64, 2, 96


def _layer(dtype=jnp.float32):
    return PFNEncoderLayer(D, H, F, 0.0, dtype=dtype, attention_impl="dense")


def _params(key, scale=0.3):
    """Random params (the zero-init trick would hide out-proj/linear2 bugs)."""
    layer = _layer()
    x = jnp.zeros((1, 8, D))
    p = layer.init(key, x, 4)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(jax.random.fold_in(key, 1), len(leaves))
    leaves = [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _to_kernel_params(p):
    m = p["params"]
    return {
        "wqkv": m["self_attn"]["qkv"]["kernel"],
        "bqkv": m["self_attn"]["qkv"]["bias"],
        "wout": m["self_attn"]["out_proj"]["kernel"],
        "bout": m["self_attn"]["out_proj"]["bias"],
        "ln1_g": m["norm1"]["scale"],
        "ln1_b": m["norm1"]["bias"],
        "w1": m["linear1"]["kernel"],
        "b1": m["linear1"]["bias"],
        "w2": m["linear2"]["kernel"],
        "b2": m["linear2"]["bias"],
        "ln2_g": m["norm2"]["scale"],
        "ln2_b": m["norm2"]["bias"],
    }


def _from_kernel_grads(dp):
    return {
        "params": {
            "self_attn": {
                "qkv": {"kernel": dp["wqkv"], "bias": dp["bqkv"]},
                "out_proj": {"kernel": dp["wout"], "bias": dp["bout"]},
            },
            "norm1": {"scale": dp["ln1_g"], "bias": dp["ln1_b"]},
            "linear1": {"kernel": dp["w1"], "bias": dp["b1"]},
            "linear2": {"kernel": dp["w2"], "bias": dp["b2"]},
            "norm2": {"scale": dp["ln2_g"], "bias": dp["ln2_b"]},
        }
    }


@pytest.mark.parametrize("B,T,sep", [(3, 24, 10), (4, 16, 0), (2, 16, 16), (1, 40, 39)])
def test_fused_forward_matches_flax(B, T, sep):
    key = jax.random.PRNGKey(0)
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    want = _layer().apply(p, x, jnp.asarray(sep))
    got = fused_encoder_layer(
        x, _to_kernel_params(p), jnp.asarray(sep), H, jnp.float32, True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5
    )


def test_fused_gradients_match_flax():
    key = jax.random.PRNGKey(2)
    p = _params(key)
    kp = _to_kernel_params(p)
    B, T, sep = 2, 24, 11
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, D))
    w = jax.random.normal(jax.random.PRNGKey(4), (B, T, D))
    sep = jnp.asarray(sep)

    def loss_flax(p, x):
        return jnp.sum(w * _layer().apply(p, x, sep))

    def loss_fused(kp, x):
        return jnp.sum(w * fused_encoder_layer(x, kp, sep, H, jnp.float32, True))

    gp_ref, gx_ref = jax.grad(loss_flax, argnums=(0, 1))(p, x)
    gp, gx = jax.grad(loss_fused, argnums=(0, 1))(kp, x)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), atol=2e-4, rtol=2e-4
    )
    gp_tree = _from_kernel_grads(gp)
    flat_ref = jax.tree_util.tree_flatten_with_path(gp_ref)[0]
    flat_got = dict(
        ("/".join(str(k) for k in path), v)
        for path, v in jax.tree_util.tree_flatten_with_path(gp_tree)[0]
    )
    for path, want in flat_ref:
        name = "/".join(str(k) for k in path)
        got = flat_got[name]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4,
            err_msg=name,
        )


def test_fused_bf16_close_to_flax_bf16():
    """bf16 compute dtype: kernel and flax layer agree to bf16 tolerance."""
    key = jax.random.PRNGKey(5)
    p = _params(key)
    B, T, sep = 2, 16, 7
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, D), jnp.bfloat16)
    want = _layer(jnp.bfloat16).apply(p, x, jnp.asarray(sep))
    got = fused_encoder_layer(
        x, _to_kernel_params(p), jnp.asarray(sep), H, jnp.bfloat16, True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.06, rtol=0.06,
    )

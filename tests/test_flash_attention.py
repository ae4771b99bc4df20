"""Pallas PFN flash-attention vs dense reference equivalence (SURVEY.md §4
item e). Runs in interpreter mode on the CPU mesh; the real-chip run is
exercised by bench/verify on TPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pfn_tpu.ops.attention import pfn_attention_reference
from pfn_tpu.ops.flash_attention import pfn_flash_attention


def make_qkv(key, B=2, H=2, T=100, D=128, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, H, T, D), dtype)
    k = jax.random.normal(ks[1], (B, H, T, D), dtype)
    v = jax.random.normal(ks[2], (B, H, T, D), dtype)
    return q, k, v


@pytest.mark.parametrize("T,sep", [(100, 50), (100, 0), (100, 99), (256, 128), (300, 17)])
def test_flash_forward_matches_dense(T, sep):
    q, k, v = make_qkv(jax.random.PRNGKey(0), T=T)
    ref = pfn_attention_reference(q, k, v, sep)
    with pltpu.force_tpu_interpret_mode():
        out = pfn_flash_attention(q, k, v, jnp.asarray(sep))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_forward_traced_sep():
    q, k, v = make_qkv(jax.random.PRNGKey(1), T=130)
    with pltpu.force_tpu_interpret_mode():
        f = jax.jit(lambda s: pfn_flash_attention(q, k, v, s))
        for sep in [3, 64, 129]:
            ref = pfn_attention_reference(q, k, v, sep)
            np.testing.assert_allclose(
                np.asarray(f(jnp.asarray(sep))), np.asarray(ref), atol=2e-5, rtol=2e-5
            )


@pytest.mark.parametrize("T,sep", [(100, 50), (256, 100)])
def test_flash_backward_matches_dense(T, sep):
    q, k, v = make_qkv(jax.random.PRNGKey(2), B=1, H=2, T=T)

    def loss_flash(q, k, v):
        o = pfn_flash_attention(q, k, v, jnp.asarray(sep))
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    def loss_dense(q, k, v):
        o = pfn_attention_reference(q, k, v, sep)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gf, gd, name in zip(g_flash, g_dense, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gd), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_flash_bf16_close_to_f32_dense():
    q, k, v = make_qkv(jax.random.PRNGKey(3), T=128, dtype=jnp.bfloat16)
    ref = pfn_attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), 64
    )
    with pltpu.force_tpu_interpret_mode():
        out = pfn_flash_attention(q, k, v, jnp.asarray(64))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )


def test_flash_large_batch_heads_uses_256_block():
    """T > 128 selects the 256-wide tile (_choose_block, T-based since the
    round-4 anomaly decomposition); equivalence must hold across the
    block-size switch."""
    from pfn_tpu.ops.flash_attention import _choose_block

    assert _choose_block(16, 128) == 128 and _choose_block(16, 2010) == 256
    assert _choose_block(64, 100) == 128 and _choose_block(64, 260) == 256
    q, k, v = make_qkv(jax.random.PRNGKey(2), B=16, H=4, T=260, D=128)
    sep = 130
    ref = pfn_attention_reference(q, k, v, sep)
    with pltpu.force_tpu_interpret_mode():
        out = pfn_flash_attention(q, k, v, jnp.asarray(sep))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


# ---- prefix + self-merge formulation (the sharded path) --------------------


def _rand_qkv(key, B=2, H=2, T=128, D=128, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (B, H, T, D), dtype),
        jax.random.normal(kk, (B, H, T, D), dtype),
        jax.random.normal(kv, (B, H, T, D), dtype),
    )


@pytest.mark.parametrize("sep", [0, 1, 37, 100, 128])
def test_prefix_merge_dense_matches_reference(sep):
    """prefix attention + exact self logsumexp merge == the PFN rule."""
    from pfn_tpu.ops.attention import (
        pfn_attention_prefix_merge,
        pfn_attention_reference,
    )

    q, k, v = _rand_qkv(jax.random.PRNGKey(0), T=128)
    want = pfn_attention_reference(q, k, v, jnp.asarray(sep))
    got = pfn_attention_prefix_merge(
        q, k, v, k, v, jnp.asarray(sep), 0, prefix_impl="dense"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_prefix_merge_gradients_match_reference():
    from pfn_tpu.ops.attention import (
        pfn_attention_prefix_merge,
        pfn_attention_reference,
    )

    q, k, v = _rand_qkv(jax.random.PRNGKey(1), B=1, H=2, T=64, D=32)
    w = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 64, 32))
    sep = jnp.asarray(29)

    def loss_merge(q, k, v):
        return jnp.sum(
            w * pfn_attention_prefix_merge(
                q, k, v, k, v, sep, 0, prefix_impl="dense"
            )
        )

    def loss_ref(q, k, v):
        return jnp.sum(w * pfn_attention_reference(q, k, v, sep))

    gm = jax.grad(loss_merge, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gm, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("sep,Tq", [(0, 128), (70, 128), (190, 256), (256, 256)])
def test_flash_prefix_kernel_matches_dense_prefix(sep, Tq):
    """The include_diag=False kernel == the dense prefix (o AND lse), with a
    sharded-shape case (Tq != Tk)."""
    from pfn_tpu.ops.attention import pfn_prefix_attention_reference
    from pfn_tpu.ops.flash_attention import pfn_flash_prefix_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(3), T=256)
    q = q[:, :, :Tq]
    want_o, want_lse = pfn_prefix_attention_reference(q, k, v, jnp.asarray(sep))
    with pltpu.force_tpu_interpret_mode():
        got_o, got_lse = pfn_flash_prefix_attention(q, k, v, jnp.asarray(sep))
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=2e-5, atol=2e-5)
    rows_with_prefix = sep > 0
    if rows_with_prefix:
        np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                                   rtol=2e-5, atol=2e-4)
    else:  # both conventions: "empty" lse is a huge negative number
        assert (np.asarray(got_lse) < -1e29).all()
        assert (np.asarray(want_lse) < -1e29).all()


def test_flash_prefix_kernel_lse_gradient():
    """dlse cotangent folds into the kernels as an adjusted delta: grads of a
    loss USING lse must match the dense prefix implementation."""
    from pfn_tpu.ops.attention import pfn_prefix_attention_reference
    from pfn_tpu.ops.flash_attention import pfn_flash_prefix_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(4), B=1, H=1, T=128)
    sep = jnp.asarray(77)

    def loss(fn):
        def inner(q, k, v):
            o, lse = fn(q, k, v, sep)
            return jnp.sum(o) + jnp.sum(jnp.tanh(lse))

        return inner

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss(pfn_flash_prefix_attention),
                           argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss(pfn_prefix_attention_reference),
                       argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_dense, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

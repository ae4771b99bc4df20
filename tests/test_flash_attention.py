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
    """B*H >= 64 selects the 256-wide tile (_choose_block); equivalence must
    hold across the block-size switch."""
    from pfn_tpu.ops.flash_attention import _choose_block

    assert _choose_block(16) == 128 and _choose_block(64) == 256
    q, k, v = make_qkv(jax.random.PRNGKey(2), B=16, H=4, T=260, D=128)
    sep = 130
    ref = pfn_attention_reference(q, k, v, sep)
    with pltpu.force_tpu_interpret_mode():
        out = pfn_flash_attention(q, k, v, jnp.asarray(sep))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

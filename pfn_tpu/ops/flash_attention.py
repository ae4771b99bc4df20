"""Pallas flash-attention kernel specialized to the PFN mask.

The PFN attention rule (reference transformer.py:35-41): query i attends to
keys {j < sep} ∪ {i}. Blockwise (BQ == BK == BLOCK):
  * KV block fully inside the train prefix (end <= sep): unmasked flash step;
  * KV block straddling sep: mask columns >= sep except the diagonal;
  * KV block past sep: contributes ONLY if it is the diagonal block of the
    query block (k == q there), otherwise it is skipped outright.

So the kernel touches O(T * sep / BLOCK^2 + T/BLOCK) blocks and never
materializes a (T, T) mask or score matrix — the reference builds the full
additive mask on host per step (transformer.py:60-65) and torch materializes
(B, H, T, T) scores; at bptt=2010 that is the dominant HBM cost this kernel
removes.

``single_eval_pos`` arrives via scalar prefetch (SMEM) so it can be a traced
value — one compilation covers all sep draws.

Forward saves the per-row logsumexp for the backward pass; backward uses the
standard flash decomposition (dv = P^T dO, ds = P * (dp - rowsum(dO*O)),
dq = ds K, dk = ds^T Q) with the same block-skip rule, implemented as two
Pallas kernels (dq over q-rows; dk/dv over kv-rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128  # default tile; _choose_block may pick larger for big B*H
_NEG_INF = -1e30


def _choose_block(batch_heads: int, t: int) -> int:
    """Tile size heuristic. ``t`` may be the raw or the padded sequence
    length — the rule is invariant under its own padding (t <= 128 pads to
    exactly 128; t > 128 with a 256 tile pads to >= 256 > 128).

    Measured on v5e at T=2010, D=128, fwd+bwd (the round-4 anomaly
    decomposition, docs/results/anomaly_10x10.json): 256x256 tiles beat
    128x128 at EVERY batch*heads measured — 16/40/80/100 at 0.066-0.083 vs
    0.41-3.8 s per 100 datasets — so the earlier small-batch*heads
    preference for 128 (which produced the round-3 batch-shape-sweep
    anomaly: 10x10 "inexplicably" slower than 4x25) was simply wrong at
    long T. 128 remains only when the sequence fits a single 128 tile,
    where a 256 tile would double the padded work."""
    del batch_heads  # kept for signature stability (A/B forcing in experiments/)
    return BLOCK if t <= BLOCK else 256


def _block_mask(block, qi, kj, sep, valid_len, include_diag=True):
    """(block, block) bool: key allowed for query, in global coordinates.

    ``include_diag=False`` is the prefix-only rule (keys < sep, no diagonal
    self-attention): the sharded path computes eval tokens' self-attention
    as an exact logsumexp merge OUTSIDE the kernel, so query indices never
    need to be global — see pfn_attention_prefix_merge."""
    ks = kj * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    allowed = (ks < sep) & (ks < valid_len)
    if include_diag:
        qs = qi * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, block), 0
        )
        allowed |= (ks == qs) & (ks < valid_len)
    return allowed


def _needed(block, qi, kj, sep, include_diag=True):
    """Does KV block kj contribute anything to query block qi?"""
    prefix = kj * block < sep
    return (prefix | (kj == qi)) if include_diag else prefix


def _fwd_kernel(block, include_diag, sep_ref, len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_i, l_i):
    qi, kj = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)
    sep = sep_ref[0]
    valid_len = len_ref[0]

    @pl.when(kj == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_i[:] = jnp.full_like(m_i, _NEG_INF)
        l_i[:] = jnp.zeros_like(l_i)

    # Skip blocks with no allowed columns: past sep and not the diagonal.
    block_needed = _needed(block, qi, kj, sep, include_diag)

    @pl.when(block_needed)
    def _compute():
        # Dots run in the INPUT dtype (bf16 on TPU -> full-rate MXU) with f32
        # accumulation via preferred_element_type; only softmax state is f32.
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK) — scale applied by caller on q
        s = jnp.where(_block_mask(block, qi, kj, sep, valid_len, include_diag), s, _NEG_INF)

        m_prev = m_i[:]
        l_prev = l_i[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_i[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_i[:] = m_cur
        v = v_ref[0]
        acc[:] = acc[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kj == nk - 1)
    def _finish():
        l = jnp.maximum(l_i[:], 1e-30)
        o_ref[0] = (acc[:] / l).astype(o_ref.dtype)
        lse_ref[0] = m_i[:] + jnp.log(l)


def _bwd_dq_kernel(
    block, include_diag, sep_ref, len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc
):
    qi, kj = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)
    sep = sep_ref[0]
    valid_len = len_ref[0]

    @pl.when(kj == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    block_needed = _needed(block, qi, kj, sep, include_diag)

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = delta_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(_block_mask(block, qi, kj, sep, valid_len, include_diag), s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq_acc[:] = dq_acc[:] + jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(kj == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    block, include_diag, sep_ref, len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_acc, dv_acc
):
    # Grid: (BH, nKV, nQ) — iterate query blocks for a fixed kv block.
    kj, qi = pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)
    sep = sep_ref[0]
    valid_len = len_ref[0]

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    block_needed = _needed(block, qi, kj, sep, include_diag)

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = delta_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(_block_mask(block, qi, kj, sep, valid_len, include_diag), s, _NEG_INF)
        p = jnp.exp(s - lse)  # (BQ, BK)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _pad(x, tp):
    t = x.shape[1]
    if t == tp:
        return x
    return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))


def _kv_select(block, qi, kj, sep_ref, include_diag=True):
    """KV-block index with DMA elision: blocks the kernel will skip are
    remapped to an already-fetched block — consecutive equal indices elide
    the copy. Diag variant: remap to the diagonal block. Prefix variant: the
    needed blocks are a contiguous prefix, so remap everything after it to
    the last needed block. The pl.when(block_needed) guard makes the stale
    data unobservable."""
    if include_diag:
        needed = (kj * block < sep_ref[0]) | (kj == qi)
        return jnp.where(needed, kj, qi)
    last = jnp.maximum((sep_ref[0] - 1) // block, 0)
    return jnp.minimum(kj, last)


def _fwd_impl(q, k, v, sep, valid_len, include_diag=True):
    """q: (BH, Tqp, D), k/v: (BH, Tkp, D) already padded & scaled (Tqp may
    differ from Tkp in the prefix variant — sharded queries vs gathered
    keys). Returns (o, lse)."""
    BH, Tqp, D = q.shape
    Tkp = k.shape[1]
    block = _choose_block(BH, max(Tqp, Tkp))
    assert Tqp % block == 0 and Tkp % block == 0, (Tqp, Tkp, block)
    grid = (BH, Tqp // block, Tkp // block)
    sep = jnp.asarray(sep, jnp.int32).reshape(1)
    valid_len = jnp.asarray(valid_len, jnp.int32).reshape(1)

    kv_spec = pl.BlockSpec(
        (1, block, D),
        lambda b, qi, kj, sep_ref, len_ref: (
            b, _kv_select(block, qi, kj, sep_ref, include_diag), 0
        ),
        memory_space=pltpu.VMEM,
    )
    q_spec = pl.BlockSpec(
        (1, block, D), lambda b, qi, kj, *_: (b, qi, 0), memory_space=pltpu.VMEM
    )
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block, include_diag),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=[
                pl.BlockSpec(
                    (1, block, D),
                    lambda b, qi, kj, *_: (b, qi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block, 1),
                    lambda b, qi, kj, *_: (b, qi, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),
                pltpu.VMEM((block, 1), jnp.float32),
                pltpu.VMEM((block, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tqp, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Tqp, 1), jnp.float32),
        ],
    )(sep, valid_len, q, k, v)
    return o, lse


def _bwd_impl(q, k, v, o, lse, sep, valid_len, do, dlse, include_diag):
    """Shared backward: returns (dq, dk, dv). ``dlse`` is the cotangent of
    the lse output ((BH, Tq, 1) or None): d lse_i / d s_ij = p_ij, so it
    folds into the standard decomposition as ds = p * (dp - (delta - dlse))
    — the kernels just receive an adjusted delta."""
    BH, Tqp, D = q.shape
    Tkp = k.shape[1]
    block = _choose_block(BH, max(Tqp, Tkp))
    nq, nk = Tqp // block, Tkp // block
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    sep_arr = jnp.asarray(sep, jnp.int32).reshape(1)
    len_arr = jnp.asarray(valid_len, jnp.int32).reshape(1)

    def spec3(index_map):
        return pl.BlockSpec((1, block, D), index_map, memory_space=pltpu.VMEM)

    def spec2(index_map):
        return pl.BlockSpec((1, block, 1), index_map, memory_space=pltpu.VMEM)

    by_q = lambda b, i, j, *_: (b, i, 0)
    by_k = lambda b, i, j, sep_ref, len_ref: (
        b, _kv_select(block, i, j, sep_ref, include_diag), 0
    )
    # dq: grid (BH, nQ, nKV)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block, include_diag),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BH, nq, nk),
            in_specs=[spec3(by_q), spec3(by_k), spec3(by_k), spec3(by_q),
                      spec2(by_q), spec2(by_q)],
            out_specs=spec3(by_q),
            scratch_shapes=[pltpu.VMEM((block, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((BH, Tqp, D), q.dtype),
    )(sep_arr, len_arr, q, k, v, do, lse, delta)

    # dk/dv: grid (BH, nKV, nQ) — program_id(1) is the kv block. Here the
    # q-side blocks are the streamed operand: remap q-blocks the kernel will
    # skip (same DMA-elision trick as _kv_select, roles swapped — for the
    # prefix variant a kv block past sep needs NO q block; remap to 0).
    def _q_select(j, i, sep_ref):
        if include_diag:
            needed = (j * block < sep_ref[0]) | (j == i)
            return jnp.where(needed, i, j)
        return jnp.where(j * block < sep_ref[0], i, 0)

    by_kv_outer = lambda b, j, i, *_: (b, j, 0)
    by_q_inner = lambda b, j, i, sep_ref, len_ref: (b, _q_select(j, i, sep_ref), 0)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block, include_diag),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BH, nk, nq),
            in_specs=[spec3(by_q_inner), spec3(by_kv_outer), spec3(by_kv_outer),
                      spec3(by_q_inner), spec2(by_q_inner), spec2(by_q_inner)],
            out_specs=[spec3(by_kv_outer), spec3(by_kv_outer)],
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),
                pltpu.VMEM((block, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tkp, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Tkp, D), v.dtype),
        ],
    )(sep_arr, len_arr, q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _flash(q, k, v, sep, valid_len):
    o, _ = _fwd_impl(q, k, v, sep, valid_len)
    return o


def _flash_fwd(q, k, v, sep, valid_len):
    o, lse = _fwd_impl(q, k, v, sep, valid_len)
    return o, (q, k, v, o, lse, sep, valid_len)


def _flash_bwd(res, do):
    q, k, v, o, lse, sep, valid_len = res
    dq, dk, dv = _bwd_impl(
        q, k, v, o, lse, sep, valid_len, do, None, include_diag=True
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _flash_prefix(q, k, v, sep, valid_len):
    """Prefix-only flash (keys < sep, no diagonal). Returns (o, lse); lse is
    a DIFFERENTIABLE output — the self-attention merge downstream depends on
    it (pfn_tpu.ops.attention.pfn_attention_prefix_merge)."""
    return _fwd_impl(q, k, v, sep, valid_len, include_diag=False)


def _flash_prefix_fwd(q, k, v, sep, valid_len):
    o, lse = _fwd_impl(q, k, v, sep, valid_len, include_diag=False)
    return (o, lse), (q, k, v, o, lse, sep, valid_len)


def _flash_prefix_bwd(res, cotangents):
    q, k, v, o, lse, sep, valid_len = res
    do, dlse = cotangents
    dq, dk, dv = _bwd_impl(
        q, k, v, o, lse, sep, valid_len, do, dlse, include_diag=False
    )
    return dq, dk, dv, None, None


_flash_prefix.defvjp(_flash_prefix_fwd, _flash_prefix_bwd)


def pfn_flash_prefix_attention(q, k, v, single_eval_pos, scale=None):
    """Prefix-only flash attention with logsumexp output.

    q: (B, H, Tq, Dh) — may be a SEQUENCE SHARD of the full query set (the
    PFN prefix rule is query-position independent, so shard-local queries
    need no global offsets). k, v: (B, H, Tk, Dh) — the FULL key/value set.
    Returns (o (B, H, Tq, Dh), lse (B, H, Tq)); rows with an empty prefix
    (sep == 0) get o = 0 and lse ~ -1e30 (so a downstream merge's sigmoid
    saturates to the self-attention branch).
    """
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    block = _choose_block(B * H, max(Tq, Tk))
    Tqp = ((Tq + block - 1) // block) * block
    Tkp = ((Tk + block - 1) // block) * block
    qf = _pad((q * scale).reshape(B * H, Tq, D), Tqp)
    kf = _pad(k.reshape(B * H, Tk, D), Tkp)
    vf = _pad(v.reshape(B * H, Tk, D), Tkp)
    o, lse = _flash_prefix(
        qf, kf, vf, jnp.asarray(single_eval_pos, jnp.int32),
        jnp.asarray(Tk, jnp.int32),
    )
    return (
        o[:, :Tq, :].reshape(B, H, Tq, D),
        lse[:, :Tq, 0].reshape(B, H, Tq),
    )


def flash_supported(q: jax.Array) -> bool:
    """Auto-dispatch predicate: flash wins when the sequence is long enough
    that the dense path's (B, H, T, T) score materialization costs HBM
    traffic (measured crossover on v5e ≈ a few hundred tokens); below that
    XLA's fused dense attention is faster. Requires lane-aligned head_dim."""
    T, D = q.shape[-2], q.shape[-1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return on_tpu and D % 128 == 0 and T >= 256


def pfn_flash_attention(q, k, v, single_eval_pos, scale=None):
    """Flash PFN attention. q,k,v: (B, H, T, Dh) -> (B, H, T, Dh).

    Equivalent to pfn_attention_reference for any traced single_eval_pos.
    T is padded to a multiple of 128 internally; Dh should be a multiple of
    128 for MXU efficiency (smaller Dh works but wastes lanes).
    """
    B, H, T, D = q.shape
    scale = scale if scale is not None else 1.0 / (D**0.5)
    block = _choose_block(B * H, T)
    Tp = ((T + block - 1) // block) * block
    qf = _pad((q * scale).reshape(B * H, T, D), Tp)
    kf = _pad(k.reshape(B * H, T, D), Tp)
    vf = _pad(v.reshape(B * H, T, D), Tp)
    sep = jnp.asarray(single_eval_pos, jnp.int32)
    o = _flash(qf, kf, vf, sep, jnp.asarray(T, jnp.int32))
    return o[:, :T, :].reshape(B, H, T, D)

"""Fused PFN encoder layer as Pallas TPU kernels (fwd + bwd).

Motivation (docs/PERF.md ceiling analysis): at the flagship shape
(B=64, T=100, D=512) the per-layer attention matmuls ride tiles under the
128-wide MXU edge and the two f32 LayerNorms per layer are HBM-bound VPU
work that cannot overlap the MXU — XLA schedules them as separate
HBM-round-trip fusions. This module folds ONE WHOLE encoder layer
(qkv proj -> PFN attention -> out proj -> residual -> LN1 -> FFN(GELU)
-> residual -> LN2) into a single Pallas kernel per direction, so every
intermediate (qkv, scores, softmax, attention output, FFN hidden) lives
and dies in VMEM. The backward pass is two kernels (FFN block, attention
block) that RECOMPUTE the forward intermediates in VMEM from the saved
layer input ``x`` and post-LN1 activation ``r`` — flash-attention-style
rematerialization, generalized to the full layer.

Semantics match ``models.transformer.PFNEncoderLayer`` with dropout=0 and
no MoE (the flagship training configs): post-LN, GELU (tanh approximation,
flax ``nn.gelu`` default), LayerNorm in f32 with eps=1e-5, matmuls in the
model compute dtype with f32 accumulation, PFN mask = keys < sep plus the
diagonal (reference transformer.py:35-41 builds this as a (T, T) additive
mask; here it is two iota compares in VMEM).

Layout: x is (B, T, D); the grid tiles the BATCH (``items_per_tile``
sequences per step) and each step computes full sequences — at T<=few
hundred a whole item's activations fit in VMEM, so no sequence tiling or
softmax streaming is needed (that regime is ops.flash_attention's).
Weight blocks use constant index maps (fetched once, VMEM-resident across
grid steps); weight/bias GRADIENTS accumulate across the sequential TPU
grid into constant-indexed output blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5  # torch nn.LayerNorm default (matches models/transformer.py)
_GELU_C = 0.7978845608028654  # sqrt(2/pi)
_GELU_A = 0.044715


def _gelu(x):
    """tanh-approximate GELU (flax nn.gelu default), f32 in-kernel."""
    u = _GELU_C * (x + _GELU_A * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_grad(x):
    u = _GELU_C * (x + _GELU_A * x * x * x)
    t = jnp.tanh(u)
    du = _GELU_C * (1.0 + 3.0 * _GELU_A * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _ln_fwd(r1):
    """f32 LayerNorm stats + normalized activations (eps inside rsqrt)."""
    mu = jnp.mean(r1, axis=-1, keepdims=True)
    c = r1 - mu
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return c * rstd, rstd


def _ln_bwd(dxh, xhat, rstd):
    """Gradient through x -> xhat (normalize only; affine handled by caller).
    dxh is the gradient w.r.t. xhat scaled by gamma already."""
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return rstd * (dxh - m1 - xhat * m2)


def _mm(a, b, *, ta=False, tb=False):
    """f32-accumulating matmul with optional transposes (no materialized .T)."""
    ca = 0 if ta else 1
    cb = 1 if tb else 0
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32
    )


def _attn_item(qkv, sep, D, H, dh, scale, cdt, lse_rows=None):
    """PFN attention for one item's (T, 3D) qkv block, all heads.

    Returns (attn (T, D) cdt, lses list of (T,1) f32, ps list of (T,T) f32).
    With ``lse_rows`` (bwd recompute) the softmax uses the saved lse instead
    of recomputing max/log-sum: exp(s - (m + log l)) = exp(s - m)/l, equal
    to the forward's probabilities up to f32 rounding (the flash-attention
    recompute identity)."""
    T = qkv.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    allowed = (cols < sep) | (cols == rows)
    attn_cols = []
    lses = []
    ps = []
    for h in range(H):
        q = qkv[:, h * dh:(h + 1) * dh].astype(jnp.float32) * scale
        k = qkv[:, D + h * dh:D + (h + 1) * dh].astype(jnp.float32)
        v = qkv[:, 2 * D + h * dh:2 * D + (h + 1) * dh]
        s = _mm(q, k, tb=True)  # (T, T) f32
        s = jnp.where(allowed, s, -1e30)
        if lse_rows is None:
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.where(allowed, jnp.exp(s - m), 0.0)
            l = jnp.sum(e, axis=-1, keepdims=True)
            p = e / l
            lse = m + jnp.log(l)
        else:
            lse = lse_rows[h]
            p = jnp.where(allowed, jnp.exp(s - lse), 0.0)
        o = _mm(p.astype(cdt), v).astype(cdt)  # (T, dh)
        attn_cols.append(o)
        lses.append(lse)
        ps.append(p)
    return jnp.concatenate(attn_cols, axis=-1), lses, ps


# ---- forward kernel ---------------------------------------------------------


def _fwd_kernel(
    nb, H, cdt,
    sep_ref,
    x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
    y_ref, r_ref, lse_ref,
):
    sep = sep_ref[0]
    D = x_ref.shape[-1]
    dh = D // H
    scale = 1.0 / (dh ** 0.5)
    wqkv = wqkv_ref[...].astype(cdt)
    wout = wout_ref[...].astype(cdt)
    w1 = w1_ref[...].astype(cdt)
    w2 = w2_ref[...].astype(cdt)
    for i in range(nb):
        xi = x_ref[i]
        xc = xi.astype(cdt)
        qkv = (_mm(xc, wqkv) + bqkv_ref[...]).astype(cdt)  # (T, 3D)
        attn, lses, _ = _attn_item(qkv, sep, D, H, dh, scale, cdt)
        # One full-tensor (T, H) store — partial-lane stores (width-1 lane
        # slices) are a Mosaic lowering hazard on real hardware.
        lse_ref[i] = jnp.concatenate(lses, axis=-1)
        ao = (_mm(attn, wout) + bout_ref[...]).astype(cdt)
        r1 = xi.astype(jnp.float32) + ao.astype(jnp.float32)
        xhat1, _ = _ln_fwd(r1)
        r = xhat1 * g1_ref[...] + be1_ref[...]
        r_ref[i] = r
        rc = r.astype(cdt)
        h1 = (_mm(rc, w1) + b1_ref[...])  # (T, F) f32
        g = _gelu(h1).astype(cdt)
        f = (_mm(g, w2) + b2_ref[...])  # (T, D) f32
        r2 = r + f
        xhat2, _ = _ln_fwd(r2)
        y_ref[i] = xhat2 * g2_ref[...] + be2_ref[...]


# ---- backward kernels -------------------------------------------------------


def _bwd_ffn_kernel(
    nb, cdt,
    r_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, dy_ref,
    dr_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg2_ref, dbe2_ref,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        dbe2_ref[...] = jnp.zeros_like(dbe2_ref)

    w1 = w1_ref[...].astype(cdt)
    w2 = w2_ref[...].astype(cdt)
    for i in range(nb):
        r = r_ref[i]  # (T, D) f32
        rc = r.astype(cdt)
        h1 = _mm(rc, w1) + b1_ref[...]
        g = _gelu(h1).astype(cdt)
        f = _mm(g, w2) + b2_ref[...]
        r2 = r + f
        xhat2, rstd2 = _ln_fwd(r2)
        dy = dy_ref[i].astype(jnp.float32)
        dg2_ref[...] += jnp.sum(dy * xhat2, axis=0, keepdims=True)
        dbe2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dr2 = _ln_bwd(dy * g2_ref[...], xhat2, rstd2)  # (T, D) f32
        db2_ref[...] += jnp.sum(dr2, axis=0, keepdims=True)
        dw2_ref[...] += _mm(g, dr2.astype(cdt), ta=True)
        dgc = _mm(dr2.astype(cdt), w2, tb=True)  # (T, F) f32
        dh1 = dgc * _gelu_grad(h1)
        db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
        dw1_ref[...] += _mm(rc, dh1.astype(cdt), ta=True)
        dr_ref[i] = dr2 + _mm(dh1.astype(cdt), w1, tb=True)


def _bwd_attn_kernel(
    nb, H, cdt,
    sep_ref,
    x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, g1_ref, lse_ref, dr_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref, dg1_ref, dbe1_ref,
    dqkv_scr,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        dbe1_ref[...] = jnp.zeros_like(dbe1_ref)

    sep = sep_ref[0]
    D = x_ref.shape[-1]
    dh = D // H
    scale = 1.0 / (dh ** 0.5)
    wqkv = wqkv_ref[...].astype(cdt)
    wout = wout_ref[...].astype(cdt)
    for i in range(nb):
        xi = x_ref[i]
        xc = xi.astype(cdt)
        qkv = (_mm(xc, wqkv) + bqkv_ref[...]).astype(cdt)
        lse_all = lse_ref[i]  # (T, H) full-tensor load, sliced in-register
        lse_rows = [lse_all[:, h:h + 1] for h in range(H)]
        attn, _, ps = _attn_item(qkv, sep, D, H, dh, scale, cdt, lse_rows)
        ao = (_mm(attn, wout) + bout_ref[...]).astype(cdt)
        r1 = xi.astype(jnp.float32) + ao.astype(jnp.float32)
        xhat1, rstd1 = _ln_fwd(r1)
        dr = dr_ref[i]  # (T, D) f32
        dg1_ref[...] += jnp.sum(dr * xhat1, axis=0, keepdims=True)
        dbe1_ref[...] += jnp.sum(dr, axis=0, keepdims=True)
        dr1 = _ln_bwd(dr * g1_ref[...], xhat1, rstd1)
        dbout_ref[...] += jnp.sum(dr1, axis=0, keepdims=True)
        dwout_ref[...] += _mm(attn, dr1.astype(cdt), ta=True)
        dattn = _mm(dr1.astype(cdt), wout, tb=True)  # (T, D) f32
        for h in range(H):
            q = qkv[:, h * dh:(h + 1) * dh].astype(jnp.float32)
            k = qkv[:, D + h * dh:D + (h + 1) * dh].astype(jnp.float32)
            v = qkv[:, 2 * D + h * dh:2 * D + (h + 1) * dh]
            p = ps[h]
            pc = p.astype(cdt)
            do = dattn[:, h * dh:(h + 1) * dh].astype(cdt)
            o = _mm(pc, v)  # recomputed head output, f32
            delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
            dp = _mm(do, v, tb=True)  # (T, T) f32
            ds = (p * (dp - delta)).astype(cdt)
            dqkv_scr[:, h * dh:(h + 1) * dh] = (
                _mm(ds, k.astype(cdt)) * scale
            )
            dqkv_scr[:, D + h * dh:D + (h + 1) * dh] = (
                _mm(ds, q.astype(cdt), ta=True) * scale
            )
            dqkv_scr[:, 2 * D + h * dh:2 * D + (h + 1) * dh] = _mm(
                pc, do, ta=True
            )
        dqkv = dqkv_scr[...]
        dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
        dwqkv_ref[...] += _mm(xc, dqkv.astype(cdt), ta=True)
        dx_ref[i] = (dr1 + _mm(dqkv.astype(cdt), wqkv, tb=True)).astype(
            dx_ref.dtype
        )


# ---- pallas_call wrappers ---------------------------------------------------

_PARAM_ORDER = (
    "wqkv", "bqkv", "wout", "bout", "ln1_g", "ln1_b",
    "w1", "b1", "w2", "b2", "ln2_g", "ln2_b",
)


def _row(a):
    """(X,) param -> (1, X) f32 for clean VMEM tiling."""
    return jnp.asarray(a, jnp.float32).reshape(1, -1)


def _const_spec(shape):
    n = len(shape)
    return pl.BlockSpec(
        shape, lambda b, *_: (0,) * n, memory_space=pltpu.VMEM
    )


def _tile_spec(nb, T, X):
    return pl.BlockSpec(
        (nb, T, X), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )


def _pick_nb(B):
    for nb in (4, 2, 1):
        if B % nb == 0:
            return nb
    return 1


def _fwd_call(x, p, sep, nhead, cdt, interpret):
    B, T, D = x.shape
    nb = _pick_nb(B)
    # Big matrices enter VMEM pre-cast to the compute dtype (halves their
    # footprint vs f32 refs + in-kernel copies — the in-kernel .astype(cdt)
    # becomes a no-op); biases/LN params stay f32 (negligible, added in f32).
    pf = {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
    for k in ("wqkv", "wout", "w1", "w2"):
        pf[k] = pf[k].astype(cdt)
    rows = [
        pf["wqkv"], _row(pf["bqkv"]), pf["wout"], _row(pf["bout"]),
        _row(pf["ln1_g"]), _row(pf["ln1_b"]),
        pf["w1"], _row(pf["b1"]), pf["w2"], _row(pf["b2"]),
        _row(pf["ln2_g"]), _row(pf["ln2_b"]),
    ]
    in_specs = [_tile_spec(nb, T, D)] + [
        _const_spec(a.shape) for a in rows
    ]
    y, r, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, nb, nhead, cdt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // nb,),
            in_specs=in_specs,
            out_specs=[
                _tile_spec(nb, T, D),
                _tile_spec(nb, T, D),
                _tile_spec(nb, T, nhead),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, T, nhead), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(sep, jnp.int32).reshape(1), x, *rows)
    return y, r, lse


def _bwd_call(x, p, sep, r, lse, dy, nhead, cdt, interpret):
    B, T, D = x.shape
    F = p["w1"].shape[1]
    nb = _pick_nb(B)
    pf = {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
    for k in ("wqkv", "wout", "w1", "w2"):
        pf[k] = pf[k].astype(cdt)  # see _fwd_call VMEM note

    # FFN block: dy -> dr (+ FFN/LN2 param grads)
    ffn_ins = [
        pf["w1"], _row(pf["b1"]), pf["w2"], _row(pf["b2"]), _row(pf["ln2_g"]),
    ]
    dr, dw1, db1, dw2, db2, dg2, dbe2 = pl.pallas_call(
        functools.partial(_bwd_ffn_kernel, nb, cdt),
        grid=(B // nb,),
        in_specs=[_tile_spec(nb, T, D)] + [
            _const_spec(a.shape) for a in ffn_ins
        ] + [_tile_spec(nb, T, D)],
        out_specs=[
            _tile_spec(nb, T, D),
            _const_spec((D, F)), _const_spec((1, F)),
            _const_spec((F, D)), _const_spec((1, D)),
            _const_spec((1, D)), _const_spec((1, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), jnp.float32),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(r, *ffn_ins, dy)

    # Attention block: dr -> dx (+ attn/LN1 param grads)
    attn_ins = [
        pf["wqkv"], _row(pf["bqkv"]), pf["wout"], _row(pf["bout"]),
        _row(pf["ln1_g"]),
    ]
    dx, dwqkv, dbqkv, dwout, dbout, dg1, dbe1 = pl.pallas_call(
        functools.partial(_bwd_attn_kernel, nb, nhead, cdt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // nb,),
            in_specs=[_tile_spec(nb, T, D)] + [
                _const_spec(a.shape) for a in attn_ins
            ] + [_tile_spec(nb, T, nhead), _tile_spec(nb, T, D)],
            out_specs=[
                _tile_spec(nb, T, D),
                _const_spec((D, 3 * D)), _const_spec((1, 3 * D)),
                _const_spec((D, D)), _const_spec((1, D)),
                _const_spec((1, D)), _const_spec((1, D)),
            ],
            scratch_shapes=[pltpu.VMEM((T, 3 * D), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), x.dtype),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(sep, jnp.int32).reshape(1), x, *attn_ins, lse, dr)

    def like(g, name):
        ref = p[name]
        return g.reshape(ref.shape).astype(ref.dtype)

    dp = {
        "wqkv": like(dwqkv, "wqkv"), "bqkv": like(dbqkv, "bqkv"),
        "wout": like(dwout, "wout"), "bout": like(dbout, "bout"),
        "ln1_g": like(dg1, "ln1_g"), "ln1_b": like(dbe1, "ln1_b"),
        "w1": like(dw1, "w1"), "b1": like(db1, "b1"),
        "w2": like(dw2, "w2"), "b2": like(db2, "b2"),
        "ln2_g": like(dg2, "ln2_g"), "ln2_b": like(dbe2, "ln2_b"),
    }
    return dx, dp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_encoder_layer(x, p, single_eval_pos, nhead, dtype=jnp.float32,
                        interpret=False):
    """One PFN encoder layer, fully fused. x: (B, T, D) (any float dtype —
    bf16 x means bf16 matmuls, matching ``TransformerConfig.dtype``);
    p: dict with wqkv (D,3D), bqkv (3D,), wout (D,D), bout (D,),
    ln1_g/ln1_b (D,), w1 (D,F), b1 (F,), w2 (F,D), b2 (D,), ln2_g/ln2_b (D,).
    ``dtype`` is the model compute dtype (matmul precision — the flax
    Dense modules cast both inputs and params to it); LN stays f32.
    Returns the post-LN2 activations, f32 (B, T, D)."""
    y, _, _ = _fwd_call(x, p, single_eval_pos, nhead, dtype, interpret)
    return y


def _fel_fwd(x, p, single_eval_pos, nhead, dtype, interpret):
    y, r, lse = _fwd_call(x, p, single_eval_pos, nhead, dtype, interpret)
    return y, (x, p, single_eval_pos, r, lse)


def _fel_bwd(nhead, dtype, interpret, res, dy):
    x, p, sep, r, lse = res
    dx, dp = _bwd_call(x, p, sep, r, lse, dy, nhead, dtype, interpret)
    return dx, dp, None


fused_encoder_layer.defvjp(_fel_fwd, _fel_bwd)

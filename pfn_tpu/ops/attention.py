"""PFN-masked attention.

The PFN attention rule (reference transformer.py:35-41, generate_D_q_matrix):
every token attends to all *train* tokens (positions < single_eval_pos), and
every token additionally attends to itself. The reference materializes this
as an additive (T, T) -inf mask on the host each step; here the rule is a
function of a single traced scalar ``single_eval_pos`` consumed inside the
attention op — no materialized mask, no recompilation when it changes.

Two implementations with identical semantics:
  * :func:`pfn_attention_reference` — fused dense jnp (XLA fuses the masked
    softmax); correctness baseline, also fast for short T.
  * :func:`pfn_flash_attention` (pfn_tpu.ops.flash_attention) — a Pallas
    flash-attention kernel that exploits the block structure of the mask
    (KV-block entirely inside the train prefix => no masking needed at all;
    the diagonal self-attention of eval tokens touches only diagonal blocks).

``pfn_attention`` dispatches between them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pfn_mask(seq_len: int, single_eval_pos) -> jax.Array:
    """Boolean (T, T) PFN mask: mask[q, k] = (k < sep) | (k == q).

    Only used by the dense reference path and tests; the Pallas kernel never
    materializes it. Parity: generate_D_q_matrix (transformer.py:35-41) with
    query_size = T - sep.
    """
    idx = jnp.arange(seq_len)
    return (idx[None, :] < single_eval_pos) | (idx[None, :] == idx[:, None])


def pfn_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    single_eval_pos,
    scale: float | None = None,
) -> jax.Array:
    """Dense PFN-masked scaled dot-product attention.

    q, k, v: (B, H, T, D); ``single_eval_pos`` a traced scalar. Returns
    (B, H, T, D). Computation in f32 accumulation regardless of input dtype.
    """
    T, D = q.shape[-2], q.shape[-1]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    mask = pfn_mask(T, single_eval_pos)
    logits = jnp.where(mask, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def pfn_prefix_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    single_eval_pos,
    scale: float | None = None,
):
    """Dense prefix-only attention (keys < sep, NO diagonal) with logsumexp.

    The jnp counterpart of ops.flash_attention.pfn_flash_prefix_attention —
    same contract: q (B, H, Tq, D) may be a sequence shard, k/v (B, H, Tk, D)
    are full; returns (o, lse (B, H, Tq)); empty-prefix rows (sep == 0) get
    o = 0 and lse ~ -1e30, mirroring the kernel's init values so the merge
    behaves identically. Used for CPU-mesh tests of the sharded composition
    and as the sharded fallback off-TPU.
    """
    D = q.shape[-1]
    Tk = k.shape[-2]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    allowed = (jnp.arange(Tk) < single_eval_pos)[None, None, None, :]
    s = jnp.where(allowed, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(allowed, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", (p / jnp.maximum(l, 1e-30)).astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]
    return o, lse


def pfn_attention_prefix_merge(
    q: jax.Array,
    k_full: jax.Array,
    v_full: jax.Array,
    k_self: jax.Array,
    v_self: jax.Array,
    single_eval_pos,
    q_global_start,
    scale: float | None = None,
    prefix_impl: str = "auto",
) -> jax.Array:
    """PFN attention as prefix attention + an exact self-attention merge.

    The PFN rule for an eval token i is softmax over {j < sep} ∪ {i}. With
    prefix output o_p and logsumexp lse from the prefix-only pass, adding the
    single self key is exact logsumexp algebra:

        w   = sigmoid(s_ii - lse)          (s_ii = scale * <q_i, k_i>)
        out = o_p + w * (v_i - o_p)        for i >= sep; o_p for i < sep

    This makes the kernel's mask independent of the QUERY index, so q may be
    any sequence shard: k_self/v_self are the shard-local rows (the same rows
    as q), and ``q_global_start`` locates the shard for the i < sep test.
    No reference equivalent (the reference materializes the (T, T) mask,
    transformer.py:35-41); this is what lets the Pallas kernel run under
    sequence-parallel shard_map without global-index plumbing.
    """
    B, H, Tq, D = q.shape
    scale = scale if scale is not None else 1.0 / (D**0.5)
    if prefix_impl == "auto":
        from pfn_tpu.ops.flash_attention import flash_supported

        prefix_impl = "flash" if flash_supported(k_full) else "dense"
    if prefix_impl == "flash":
        from pfn_tpu.ops.flash_attention import pfn_flash_prefix_attention

        o_p, lse = pfn_flash_prefix_attention(
            q, k_full, v_full, single_eval_pos, scale=scale
        )
    else:
        o_p, lse = pfn_prefix_attention_reference(
            q, k_full, v_full, single_eval_pos, scale=scale
        )
    s_self = (
        jnp.sum(
            q.astype(jnp.float32) * k_self.astype(jnp.float32), axis=-1
        )
        * scale
    )  # (B, H, Tq)
    w = jax.nn.sigmoid(s_self - lse)[..., None].astype(o_p.dtype)
    merged = o_p + w * (v_self - o_p)
    gi = q_global_start + jnp.arange(Tq)
    is_train = (gi < single_eval_pos)[None, None, :, None]
    return jnp.where(is_train, o_p, merged)


def pfn_sharded_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    single_eval_pos,
    mesh,
    scale: float | None = None,
    prefix_impl: str = "auto",
) -> jax.Array:
    """PFN attention under a ('dp', 'sp', 'tp', 'ep') mesh via shard_map.

    Layout (the scaling-book recipe): batch over 'dp', heads over 'tp',
    sequence over 'sp'; K/V are all-gathered over 'sp' (the only collective —
    rides ICI), queries stay sharded, and the prefix+merge formulation makes
    the kernel correct on shard-local queries. Replicated over 'ep'.

    A Pallas call under GSPMD auto-partitioning is not partitionable (and
    interpret-mode callbacks are side-effecting), so the kernel must live
    inside a manual shard_map region — this wrapper is the supported
    composition for BOTH the dense and flash prefix implementations.
    """
    from pfn_tpu.ops.shard_compat import shard_map
    from jax.sharding import PartitionSpec as P

    B, H, Tq, D = q.shape
    spec = P("dp", "tp", "sp", None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        check_rep=False,
    )
    def inner(q, k, v, sep):
        sep = sep[0]
        k_full = jax.lax.all_gather(k, "sp", axis=2, tiled=True)
        v_full = jax.lax.all_gather(v, "sp", axis=2, tiled=True)
        q_start = jax.lax.axis_index("sp") * q.shape[2]
        return pfn_attention_prefix_merge(
            q, k_full, v_full, k, v, sep, q_start,
            scale=scale, prefix_impl=prefix_impl,
        )

    return inner(q, k, v, jnp.asarray(single_eval_pos, jnp.int32).reshape(1))


def _mesh_divisible(q: jax.Array, mesh) -> bool:
    B, H, T, _ = q.shape
    shape = mesh.shape
    return (
        B % shape.get("dp", 1) == 0
        and H % shape.get("tp", 1) == 0
        and T % shape.get("sp", 1) == 0
    )


def pfn_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    single_eval_pos,
    impl: str = "auto",
    scale: float | None = None,
    mesh=None,
) -> jax.Array:
    """Dispatching PFN attention. impl: 'dense' | 'flash' | 'auto';
    ``scale`` overrides the default 1/sqrt(head_dim) on either path.

    With a multi-device ``mesh`` and a non-dense impl, dispatches to
    :func:`pfn_sharded_attention` (shard_map; Pallas prefix kernel on TPU,
    dense prefix elsewhere). Falls back to the dense reference when the
    shapes don't divide the mesh (e.g. the B=1 init tracer) — GSPMD
    partitions that path automatically.
    """
    if impl == "dense":
        return pfn_attention_reference(q, k, v, single_eval_pos, scale=scale)
    if impl == "prefix":
        # Single-device prefix+self-merge: the exact formulation the sharded
        # flash path computes per shard. prefix_impl='auto' keeps the dense
        # prefix pass off-TPU (CPU tests exercise the merge math end to end
        # without a Pallas backend) and selects the Pallas flash prefix
        # kernel on TPU — this is the composition pipeline-parallel stages
        # use, since each pp stage holds the full sequence locally.
        return pfn_attention_prefix_merge(
            q, k, v, k, v, single_eval_pos, 0, scale=scale,
            prefix_impl="auto",
        )
    if impl == "fused":
        # 'fused' selects models.fused_apply (whole-layer kernels) at the
        # TRANSFORMER level; a flax-path call with it (evals, or an
        # unsupported fused config) behaves as 'auto'.
        impl = "auto"
    if impl in ("flash", "auto"):
        from pfn_tpu.ops.flash_attention import pfn_flash_attention, flash_supported

        if mesh is not None and any(
            mesh.shape.get(a, 1) > 1 for a in ("dp", "sp", "tp")
        ):
            if _mesh_divisible(q, mesh):
                on_tpu = jax.default_backend() in ("tpu", "axon")
                want_flash = impl == "flash" or flash_supported(q)
                return pfn_sharded_attention(
                    q, k, v, single_eval_pos, mesh, scale=scale,
                    prefix_impl="flash" if (want_flash and on_tpu) else "dense",
                )
            return pfn_attention_reference(
                q, k, v, single_eval_pos, scale=scale
            )
        if impl == "flash" or flash_supported(q):
            return pfn_flash_attention(q, k, v, single_eval_pos, scale=scale)
        return pfn_attention_reference(q, k, v, single_eval_pos, scale=scale)
    raise ValueError(f"unknown attention impl {impl!r}")

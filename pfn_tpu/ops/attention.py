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


def pfn_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    single_eval_pos,
    impl: str = "auto",
    scale: float | None = None,
) -> jax.Array:
    """Dispatching PFN attention. impl: 'dense' | 'flash' | 'auto';
    ``scale`` overrides the default 1/sqrt(head_dim) on either path."""
    if impl == "dense":
        return pfn_attention_reference(q, k, v, single_eval_pos, scale=scale)
    if impl in ("flash", "auto"):
        from pfn_tpu.ops.flash_attention import pfn_flash_attention, flash_supported

        if impl == "flash" or flash_supported(q):
            return pfn_flash_attention(q, k, v, single_eval_pos, scale=scale)
        return pfn_attention_reference(q, k, v, single_eval_pos, scale=scale)
    raise ValueError(f"unknown attention impl {impl!r}")

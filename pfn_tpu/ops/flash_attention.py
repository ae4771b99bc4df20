"""Pallas flash-attention kernel specialized to the PFN mask.

Mask structure (see pfn_tpu.ops.attention): query q attends to keys
{k < sep} ∪ {q}. Blockwise this means:
  * KV block entirely below sep: plain unmasked flash block.
  * KV block straddling sep: mask columns >= sep, except the diagonal.
  * KV block past sep: only the diagonal block contributes (k == q), and only
    for queries q >= sep.

Placeholder: the kernel lands in a later milestone; ``flash_supported``
returns False so ``pfn_attention(impl='auto')`` uses the dense path.
"""

from __future__ import annotations

import jax


def flash_supported(q: jax.Array) -> bool:
    return False


def pfn_flash_attention(q, k, v, single_eval_pos):
    raise NotImplementedError("Pallas PFN flash attention lands in a later milestone")

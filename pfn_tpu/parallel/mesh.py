"""Mesh + sharding layer.

The reference is strictly single-device (reference train.py:29; no
torch.distributed anywhere — SURVEY.md §2). The TPU-native scaling story is
a ``jax.sharding.Mesh`` with up to three SPMD axes plus a pipeline axis
(see pfn_tpu.parallel.pipeline):

  * ``dp`` (data parallel): the batch axis = many independent synthetic
    datasets. Prior sampling shards trivially (each device consumes its own
    slice of the PRNG-keyed batch — zero communication); gradients are
    all-reduced by XLA over ICI. With ``fsdp=True`` parameter/optimizer
    state is additionally sharded over ``dp`` (ZeRO-3 style) and XLA
    inserts the per-use all-gathers.
  * ``tp`` (tensor parallel): attention qkv / FFN columns sharded; the
    out-projection / second FFN linear row-sharded so XLA inserts a single
    all-reduce per block.
  * ``sp`` (sequence parallel): activations sharded over the sequence axis
    between attention blocks — the long-context (bptt=2010 Fig-3a) axis.
    Attention gathers K/V over ``sp``; everything else (FFN, LayerNorm,
    loss) runs sequence-sharded.

Everything runs through ``jax.jit`` with NamedSharding constraints — XLA
SPMD inserts the collectives; there is no hand-written communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int | None = None, tp: int = 1, sp: int = 1, ep: int = 1, devices=None
) -> Mesh:
    """Create a ('dp', 'sp', 'tp', 'ep') mesh. Defaults: all data-parallel.

    Size-1 axes are always present (P specs referencing them are then
    no-ops), so sharding rules are mesh-shape agnostic. 'ep' is the
    expert-parallel axis for MoE layers (pfn_tpu.models.moe).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (tp * sp * ep) == 0
        dp = n // (tp * sp * ep)
    assert dp * tp * sp * ep == n, (
        f"dp*sp*tp*ep={dp * sp * tp * ep} != {n} devices"
    )
    arr = np.asarray(devices).reshape(dp, sp, tp, ep)
    return Mesh(arr, axis_names=("dp", "sp", "tp", "ep"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, ...) arrays: batch over 'dp', sequence over 'sp'."""
    if mesh.shape.get("sp", 1) > 1:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def token_sharding(mesh: Mesh) -> NamedSharding | None:
    """Activation sharding for (B, T, D) token streams, or None if the mesh
    has no sequence axis (constraint would be a no-op)."""
    if mesh.shape.get("sp", 1) > 1:
        return NamedSharding(mesh, P("dp", "sp", None))
    return None


def expert_sharding(mesh: Mesh) -> NamedSharding | None:
    """Sharding for the MoE dispatched tensor (B, E, C, D): experts over
    'ep' (XLA inserts the dispatch/combine all-to-alls), batch over 'dp'."""
    if mesh.shape.get("ep", 1) > 1:
        return NamedSharding(mesh, P("dp", "ep", None, None))
    return None


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Name-based tensor-parallel rules for PFNTransformer parameters: matmul
# column-sharded layers (qkv, linear1, decoder fc1) and row-sharded layers
# (out_proj, linear2, decoder fc2). Everything else is replicated — unless
# fsdp=True, in which case remaining kernel dims shard over 'dp'.
_COL_SHARDED = ("qkv", "linear1", "fc1")
_ROW_SHARDED = ("out_proj", "linear2", "fc2")


def _spec_for(path: tuple, value, fsdp: bool) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    is_kernel = names[-1] == "kernel"
    is_bias = names[-1] == "bias"
    dp = "dp" if fsdp else None
    # MoE expert weights carry a leading (E, ...) axis -> shard over 'ep'.
    if "moe" in joined and names[-1] in ("w1", "w2", "b1", "b2"):
        return P("ep", *([None] * (value.ndim - 1)))
    for tag in _COL_SHARDED:
        if tag in joined:
            if is_kernel:
                return P(dp, "tp")
            if is_bias:
                return P("tp")
    for tag in _ROW_SHARDED:
        if tag in joined and is_kernel:
            return P("tp", dp)
    if fsdp and is_kernel and value.ndim >= 2:
        # ZeRO-3 for the remaining (replicated-under-tp) kernels: shard the
        # larger dim over 'dp'. XLA all-gathers at use, keeps the Adam state
        # and the weight update sharded.
        axis = int(np.argmax(value.shape))
        spec = [None] * value.ndim
        spec[axis] = "dp"
        return P(*spec)
    return P()


def param_sharding(params, mesh: Mesh, fsdp: bool = False):
    """A pytree of NamedShardings for a PFNTransformer param tree.

    ``fsdp=True`` additionally shards parameters (and therefore optimizer
    state, which mirrors param placement) over the 'dp' axis.
    """

    def leaf(path, value):
        spec = _spec_for(path, value, fsdp)
        # Guard: only shard if the dimension divides evenly.
        out = []
        for axis, name in enumerate(spec):
            size = mesh.shape.get(name, 1) if name else 1
            out.append(name if value.shape[axis] % size == 0 else None)
        return NamedSharding(mesh, P(*out))

    return jax.tree_util.tree_map_with_path(leaf, params)

"""Mesh + sharding layer.

The reference is strictly single-device (reference train.py:29; no
torch.distributed anywhere — SURVEY.md §2). The TPU-native scaling story is
a ``jax.sharding.Mesh`` with two axes:

  * ``dp`` (data parallel): the batch axis = many independent synthetic
    datasets. Prior sampling shards trivially (each device consumes its own
    slice of the PRNG-keyed batch — zero communication); gradients are
    all-reduced by XLA over ICI.
  * ``tp`` (tensor parallel): attention qkv / FFN columns sharded; the
    out-projection / second FFN linear row-sharded so XLA inserts a single
    all-reduce per block.

Everything runs through ``jax.jit`` with NamedSharding constraints — XLA
SPMD inserts the collectives; there is no hand-written communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Create a ('dp', 'tp') mesh. Defaults: all devices data-parallel."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-first arrays sharded over dp on axis 0."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Name-based tensor-parallel rules for PFNTransformer parameters: matmul
# column-sharded layers (qkv, linear1, decoder fc1) and row-sharded layers
# (out_proj, linear2, decoder fc2). Everything else is replicated.
_COL_SHARDED = ("qkv", "linear1", "fc1")
_ROW_SHARDED = ("out_proj", "linear2", "fc2")


def _spec_for(path: tuple, value) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    is_kernel = names[-1] == "kernel"
    is_bias = names[-1] == "bias"
    for tag in _COL_SHARDED:
        if tag in joined:
            if is_kernel:
                return P(None, "tp")
            if is_bias:
                return P("tp")
    for tag in _ROW_SHARDED:
        if tag in joined and is_kernel:
            return P("tp", None)
    return P()


def param_sharding(params, mesh: Mesh):
    """A pytree of NamedShardings for a PFNTransformer param tree."""

    def leaf(path, value):
        spec = _spec_for(path, value)
        # Guard: only shard if the dimension divides evenly.
        tp = mesh.shape.get("tp", 1)
        for axis, name in enumerate(spec):
            if name == "tp" and value.shape[axis] % tp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)

"""shard_map version compat: jax renamed ``check_rep`` (the old
``jax.experimental.shard_map``) to ``check_vma`` (``jax.shard_map``).
Callers in this repo always pass ``check_rep=``; the wrapper forwards it
under whichever name the installed jax accepts.
"""

import inspect

from jax import shard_map as _shard_map

_CHECK_KW = (
    "check_vma"
    if "check_vma" in inspect.signature(_shard_map).parameters
    else "check_rep"
)


def shard_map(f, **kwargs):
    kwargs[_CHECK_KW] = kwargs.pop("check_rep")
    return _shard_map(f, **kwargs)

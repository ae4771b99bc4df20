"""shard_map version compat.

jax moved shard_map from ``jax.experimental.shard_map`` to ``jax.shard_map``
and renamed ``check_rep`` to ``check_vma`` along the way. Callers in this
repo always pass ``check_rep=``; the wrapper imports whichever home exists
and forwards the flag under whichever name the installed jax accepts.
"""

import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax: only the experimental home exists
    from jax.experimental.shard_map import shard_map as _shard_map

_CHECK_KW = (
    "check_vma"
    if "check_vma" in inspect.signature(_shard_map).parameters
    else "check_rep"
)


def shard_map(f, **kwargs):
    kwargs[_CHECK_KW] = kwargs.pop("check_rep")
    return _shard_map(f, **kwargs)

"""Device-mesh parallelism: mesh construction and sharding rules."""

from pfn_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    replicate,
)

__all__ = ["make_mesh", "batch_sharding", "param_sharding", "replicate"]

"""Device-mesh parallelism: mesh construction and sharding rules."""

from pfn_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    replicate,
    token_sharding,
)
from pfn_tpu.parallel.pipeline import (
    PipelinedPFN,
    make_pp_mesh,
    make_pp_train_step,
    to_pipeline_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_sharding",
    "replicate",
    "token_sharding",
    "PipelinedPFN",
    "make_pp_mesh",
    "make_pp_train_step",
    "to_pipeline_params",
]

"""Device mesh construction and GSPMD sharding rules."""

from tpdm_tpu.parallel.mesh import auto_mesh_shape, make_mesh
from tpdm_tpu.parallel.sharding import (
    batch_spec,
    mmdit_param_specs,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "auto_mesh_shape",
    "make_mesh",
    "batch_spec",
    "mmdit_param_specs",
    "replicate",
    "shard_batch",
    "shard_params",
]

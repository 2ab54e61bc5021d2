from .mesh import (
    coordination_barrier,
    get_mesh,
    init_sharded,
    param_partition_spec,
    place_like,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "coordination_barrier",
    "get_mesh",
    "init_sharded",
    "param_partition_spec",
    "place_like",
    "replicate",
    "shard_batch",
    "shard_params",
]

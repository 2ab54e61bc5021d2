from .mesh import coordination_barrier, get_mesh, shard_batch, replicate

__all__ = ["coordination_barrier", "get_mesh", "shard_batch", "replicate"]

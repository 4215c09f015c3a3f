from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh, local_mesh
from vlrlhf_tpu.core.partitioning import (
    ShardingRules,
    make_sharding,
    shard_pytree,
    logical_to_sharding,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "local_mesh",
    "ShardingRules",
    "make_sharding",
    "shard_pytree",
    "logical_to_sharding",
]

from artgraph_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated,
    shard_params,
    distributed_init,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
    "distributed_init",
]

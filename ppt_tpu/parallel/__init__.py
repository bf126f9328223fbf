from ppt_tpu.parallel.mesh import (
    create_mesh,
    init_multihost,
    shard_batch,
    replicate,
    data_sharding,
)

__all__ = [
    "create_mesh", "init_multihost", "shard_batch", "replicate",
    "data_sharding",
]

from ppt_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    replicate,
    data_sharding,
)

__all__ = ["create_mesh", "shard_batch", "replicate", "data_sharding"]

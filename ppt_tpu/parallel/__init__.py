from ppt_tpu.parallel.mesh import (
    create_mesh,
    init_multihost,
    shard_batch,
    replicate,
    data_sharding,
)
from ppt_tpu.parallel.pipeline import (
    pipeline_blocks,
    pipelined_partseg_features,
    pipelined_trunk_features,
    stack_vit_blocks,
)

__all__ = [
    "create_mesh", "init_multihost", "shard_batch", "replicate",
    "data_sharding", "pipeline_blocks", "pipelined_partseg_features",
    "pipelined_trunk_features", "stack_vit_blocks",
]

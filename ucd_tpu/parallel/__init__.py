from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    channel_sharding,
    make_mesh,
    make_mesh_2d,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "channel_sharding",
           "make_mesh", "make_mesh_2d", "make_mesh_for_batch", "replicate",
           "replicated", "shard_batch"]

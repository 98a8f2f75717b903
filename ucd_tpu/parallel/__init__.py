from .distributed import local_batch_size, maybe_initialize
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    bundle_sharding,
    channel_sharding,
    make_mesh,
    make_mesh_2d,
    make_mesh_2d_hybrid,
    make_mesh_for_batch,
    make_mesh_multiprocess,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "bundle_sharding", "channel_sharding",
           "local_batch_size", "make_mesh", "make_mesh_2d",
           "make_mesh_2d_hybrid", "make_mesh_for_batch",
           "make_mesh_multiprocess", "maybe_initialize", "replicate",
           "replicated", "shard_batch"]

from ceigm_unet_tpu.parallel.mesh import (
    make_mesh, data_sharding, replicated_sharding, shard_batch)

__all__ = ["make_mesh", "data_sharding", "replicated_sharding",
           "shard_batch"]

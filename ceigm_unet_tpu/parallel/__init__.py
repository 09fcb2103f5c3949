from ceigm_unet_tpu.parallel.mesh import (
    make_mesh, data_sharding, replicated_sharding, shard_batch)
from ceigm_unet_tpu.parallel.ring_scan import (
    sequence_parallel_scan, selective_scan_sp)

__all__ = ["make_mesh", "data_sharding", "replicated_sharding",
           "shard_batch", "sequence_parallel_scan", "selective_scan_sp"]

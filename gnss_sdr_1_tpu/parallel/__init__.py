"""Multi-device sharding (channel data-parallelism + time-block sharding).

Reference parity: NONE — the reference has no distribution (SURVEY.md §2.14);
its parallelism is GNU Radio thread-per-block + SIMD.  Here satellite
channels shard across a device mesh ('channel' axis — the DP analogue), the
acquisition Doppler grid batches freely, and long IQ streams can shard over a
'time' axis with overlap-save halo exchange (SURVEY.md §5 long-context
analogue).  Collectives ride XLA (psum/all_gather/ppermute) via NamedSharding
+ jit — the NCCL/MPI-equivalent layer.
"""

from .sharding import (
    channel_mesh,
    shard_channel_tree,
    replicate,
    time_mesh,
    halo_exchange_blocks,
    init_distributed,
    host_channel_mesh,
    shard_host_channel_tree,
)

__all__ = [
    "channel_mesh", "shard_channel_tree", "replicate", "time_mesh",
    "halo_exchange_blocks", "init_distributed", "host_channel_mesh",
    "shard_host_channel_tree",
]

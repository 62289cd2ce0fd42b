"""Device mesh and sharding helpers (data parallelism over ICI)."""

from neuralnet_tracker_traincode_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

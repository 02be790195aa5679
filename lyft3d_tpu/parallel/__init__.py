"""Device-mesh / sharding helpers (pjit DP+TP over ICI)."""

from lyft3d_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_sharding,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_sharding"]

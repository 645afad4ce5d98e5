from lhotse_tpu.parallel.pool import ParallelExecutor, SubmitterThread, parallel_map
from lhotse_tpu.parallel.mesh import (data_parallel_mesh, host_local_to_global, shard_batch)

__all__ = [
    "ParallelExecutor", "SubmitterThread", "parallel_map", "data_parallel_mesh",
    "host_local_to_global", "shard_batch"]

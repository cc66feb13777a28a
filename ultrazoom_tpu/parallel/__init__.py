from ultrazoom_tpu.parallel.mesh import (
    batch_sharded,
    jit_data_parallel,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharded",
    "jit_data_parallel",
    "make_mesh",
    "replicated",
    "shard_batch",
]

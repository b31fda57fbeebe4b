from simclr_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    put_replicated,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "put_replicated",
    "replicated",
    "shard_batch",
]

"""Distribution tier: shard_map data parallelism over TPU meshes."""

from keras_nerf_tpu.parallel.data_parallel import (
    DATA_AXIS,
    REPLICA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_fns,
    sharded_eval_step,
    sharded_render,
    sharded_render_occ,
    sharded_train_step,
)

__all__ = [
    "DATA_AXIS",
    "REPLICA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_batch_fns",
    "sharded_eval_step",
    "sharded_render",
    "sharded_render_occ",
    "sharded_train_step",
]

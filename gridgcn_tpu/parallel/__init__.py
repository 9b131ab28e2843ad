from gridgcn_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_batch, replicate_tree)
from gridgcn_tpu.parallel.dp import (
    make_parallel_train_step, make_parallel_eval_step)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "make_parallel_train_step",
    "make_parallel_eval_step",
]

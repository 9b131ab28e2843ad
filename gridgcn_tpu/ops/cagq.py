"""Coverage-Aware Grid Query — the fused F-01→F-04 pipeline (SURVEY §3.2).

This is the TPU-native equivalent of the reference's `gridify` custom op:
voxel-table build → center sampling (RVS/CAS) → node-point gather, one call
per GridConv layer. It is pure index computation (no parameters, no
gradients — the reference's op registers a zero backward, SURVEY §2.1 F-06);
indices flow into dense XLA gathers inside GCA.
"""

from __future__ import annotations

import jax
from flax import struct

from gridgcn_tpu.configs.base import GridLayerSpec
from gridgcn_tpu.ops.gather import GroupedNodes, gather_nodes
from gridgcn_tpu.ops.sampling import sample_centers_cas, sample_centers_rvs
from gridgcn_tpu.ops.voxelize import VoxelTable, build_voxel_table


@struct.dataclass
class CAGQOutput:
    table: VoxelTable
    groups: GroupedNodes


def cagq(xyz: jax.Array, mask: jax.Array, spec: GridLayerSpec,
         key: jax.Array, bounds=None) -> CAGQOutput:
    """Run one layer's CAGQ: xyz [B, N, 3], mask [B, N] → centers + groups.

    Index tensors are bitwise-deterministic for a fixed key (SURVEY §7 H6).
    `bounds` optionally fixes the grid to explicit (origin, vsize) — see
    build_voxel_table; used by spatial sharding (F-22).
    """
    k_build, k_sample, k_gather = jax.random.split(key, 3)
    need_candidates = (spec.use_context_pool
                       and spec.context_pool_source == "candidates")
    # Packed-key node selection (top_k returns its payload: selection keys
    # carry [valid | random | coverage | point index]) beats the slot-table
    # path by a large margin (its take_along_axis selection costs ~17 ms per
    # scannet_seg train step in XLA's lowering) and is the more
    # reference-faithful semantics (per-point retention randomness). The
    # slot-table path remains for 'candidates' context pooling, which needs
    # the raw [M, P·nv] candidate indices, and as the selection oracle in
    # tests. Note: packed keys clamp the coverage weight at 63 (6 bits).
    use_packed = not need_candidates
    # the F-04 context walk pads the key table with (r, context) sentinel
    # rows; scattering into the padded buffer up front removes that
    # runtime pad-concat from the hot path (ops/voxelize key_pad)
    r = (spec.context - 1) // 2
    # the packed path never reads the raw-coverage grid (GCA coverage rides
    # the selection keys; samplers test occupancy > 0), so its build packs
    # seg_pos+occupancy into ONE [N]-row scatter and skips the coverage
    # scatter (~0.35 ms/scene at whole-scene N; scatters are row-rate-bound)
    table = build_voxel_table(xyz, mask, spec.resolution, spec.nv, k_build,
                              with_keys=use_packed,
                              with_slots=not use_packed,
                              bounds=bounds,
                              key_pad=(r, spec.context),
                              sel_coords=use_packed and (
                                  spec.coord_match or spec.coord_payload),
                              with_coverage=not use_packed)

    if spec.sampler == "rvs":
        center_vids, center_valid = sample_centers_rvs(
            table, spec.n_centers, k_sample, approx=spec.approx_select)
    elif spec.sampler == "cas":
        center_vids, center_valid = sample_centers_cas(
            table, spec.n_centers, k_sample, context=spec.context,
            cas_iters=spec.cas_iters, approx=spec.approx_select)
    else:
        raise ValueError(f"unknown sampler: {spec.sampler}")

    groups = gather_nodes(
        table, xyz, center_vids, center_valid,
        spec.k_neighbors, spec.context, k_gather,
        center_mode=spec.center_mode, approx=use_packed,
        return_candidates=need_candidates, approx_topk=spec.approx_topk,
        coord_payload=spec.coord_payload)
    return CAGQOutput(table=table, groups=groups)

from gridgcn_tpu.ops.voxelize import VoxelTable, build_voxel_table, capacity_stats
from gridgcn_tpu.ops.sampling import sample_centers_rvs, sample_centers_cas
from gridgcn_tpu.ops.gather import GroupedNodes, gather_nodes, center_positions
from gridgcn_tpu.ops.cagq import CAGQOutput, cagq
from gridgcn_tpu.ops.upsample import (
    dense_three_nn, grid_three_nn, three_nn_interpolate)
from gridgcn_tpu.ops.fps import ball_query, farthest_point_sampling

__all__ = [
    "VoxelTable",
    "build_voxel_table",
    "capacity_stats",
    "sample_centers_rvs",
    "sample_centers_cas",
    "GroupedNodes",
    "gather_nodes",
    "center_positions",
    "CAGQOutput",
    "cagq",
    "dense_three_nn",
    "grid_three_nn",
    "three_nn_interpolate",
    "ball_query",
    "farthest_point_sampling",
]

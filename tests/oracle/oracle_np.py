"""Pure-NumPy oracle for the CAGQ geometry (SURVEY.md §4.2 #1).

Written directly from the paper's definitions (arXiv:1912.02984 §3.1),
independent of the jnp implementation, to cross-check invariants: voxel
assignment, coverage counts, context membership, and barycenters. Random
*choices* (which points a voxel retains, which voxels RVS picks) are
implementation-defined, so tests assert set/count invariants rather than
exact index equality.
"""

from __future__ import annotations

import numpy as np


def grid_bounds(xyz: np.ndarray, mask: np.ndarray, resolution: int):
    """Must mirror gridgcn_tpu.ops.voxelize.grid_bounds numerics."""
    pts = xyz[mask]
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    extent = np.maximum(hi - lo, 1e-4)
    vsize = extent * (1.0 + 1e-5) / resolution
    return lo, vsize


def voxel_ids(xyz: np.ndarray, mask: np.ndarray, origin, vsize,
              resolution: int) -> np.ndarray:
    V = resolution ** 3
    coords = np.floor((xyz - origin) / vsize).astype(np.int64)
    coords = np.clip(coords, 0, resolution - 1)
    vid = (coords[..., 0] * resolution + coords[..., 1]) * resolution \
        + coords[..., 2]
    return np.where(mask, vid, V)


def coverage_counts(vid: np.ndarray, resolution: int) -> np.ndarray:
    V = resolution ** 3
    return np.bincount(vid[vid < V], minlength=V)


def vid_coords(vid: np.ndarray, resolution: int) -> np.ndarray:
    z = vid % resolution
    y = (vid // resolution) % resolution
    x = vid // (resolution * resolution)
    return np.stack([x, y, z], axis=-1)


def chebyshev_voxel_dist(vid_a, vid_b, resolution: int) -> np.ndarray:
    ca = vid_coords(np.asarray(vid_a), resolution)
    cb = vid_coords(np.asarray(vid_b), resolution)
    return np.abs(ca - cb).max(axis=-1)


def covered_voxels(sel_vids: np.ndarray, sel_valid: np.ndarray,
                   resolution: int, context: int) -> int:
    """Number of distinct voxels covered by the selected centers' context —
    the paper's space-coverage measure (Fig. 2), used for the CAS ≥ RVS
    property test."""
    r = (context - 1) // 2
    covered = set()
    for v, ok in zip(sel_vids, sel_valid):
        if not ok:
            continue
        x, y, z = vid_coords(np.array(v), resolution)
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                for dz in range(-r, r + 1):
                    nx, ny, nz = x + dx, y + dy, z + dz
                    if (0 <= nx < resolution and 0 <= ny < resolution
                            and 0 <= nz < resolution):
                        covered.add(((nx * resolution) + ny) * resolution + nz)
    return len(covered)


def brute_force_knn(query: np.ndarray, support: np.ndarray,
                    support_mask: np.ndarray, k: int):
    """Exact k-NN (for validating the grid 3-NN upsample query on dense
    supports where the context always contains the true neighbors)."""
    d2 = ((query[:, None, :] - support[None, :, :]) ** 2).sum(-1)
    d2[:, ~support_mask] = np.inf
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)

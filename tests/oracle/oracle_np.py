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


def cas_gauss_seidel(occ_vids: np.ndarray, M: int, resolution: int,
                     context: int, rng: np.random.Generator,
                     iters: int = 1):
    """Sequential (Gauss-Seidel) CAS, the reference's CUDA loop shape
    (SURVEY §2.1 F-03, paper §3.1): one challenge at a time, coverage counts
    updated after EVERY accepted swap. The production sampler is
    batched-Jacobi (ops/sampling.py); this oracle quantifies the fidelity
    gap (docs/design.md §9 study, VERDICT r1 next-round #10).

    Returns selected voxel ids [<=M]."""
    V = resolution ** 3
    r = (context - 1) // 2

    def ctx(v):
        x, y, z = vid_coords(np.array(v), resolution)
        out = []
        for dx in range(-r, r + 1):
            nx = x + dx
            if not 0 <= nx < resolution:
                continue
            for dy in range(-r, r + 1):
                ny = y + dy
                if not 0 <= ny < resolution:
                    continue
                for dz in range(-r, r + 1):
                    nz = z + dz
                    if 0 <= nz < resolution:
                        out.append(((nx * resolution) + ny) * resolution + nz)
        return out

    occ = np.asarray(occ_vids)
    if len(occ) <= M:
        return occ.copy()
    sel = rng.choice(occ, M, replace=False)
    sel_set = set(int(v) for v in sel)
    C = np.zeros(V, np.int64)
    for v in sel:
        for u in ctx(v):
            C[u] += 1

    sel = list(sel_set)
    for _ in range(iters):
        challengers = rng.permutation([v for v in occ
                                       if int(v) not in sel_set])
        for chal in challengers:
            i = rng.integers(0, len(sel))
            inc = sel[i]
            h_add = sum(1 for u in ctx(chal) if C[u] == 0)
            h_rmv = sum(1 for u in ctx(inc) if C[u] == 1)
            if h_add > h_rmv:
                for u in ctx(inc):
                    C[u] -= 1
                for u in ctx(chal):
                    C[u] += 1
                sel_set.discard(int(inc))
                sel_set.add(int(chal))
                sel[i] = int(chal)
    return np.asarray(sel)

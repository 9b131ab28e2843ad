"""F-05: decoder-side upsample neighbor query (`gridify_up` equivalent).

For every point of the *denser* level, find its k nearest points of the
*coarser* level using the coarse level's voxel grid instead of a brute-force
O(Nq·Ns) 3-NN search (SURVEY §2.1 F-05, §3.4): candidates are the ≤ context³·nv
points stored in the query point's voxel context, so cost is O(Nq · P·nv) with
static shapes. Inverse-distance interpolation weights ride along for the
feature-propagation decoder (F-10), exactly PointNet++-style but grid-indexed.

TPU layout design (SURVEY §7 H4 — this is the hot decoder op at 80K+ points):
  * support coordinates are **scattered into the voxel table** once
    (`[V+1, 3·nv]` packed rows: x-slots | y-slots | z-slots, empty slots and
    the out-of-grid sentinel row V hold +BIG), so the per-query inner loop is
    one contiguous row-gather per context voxel + dense VPU arithmetic — no
    per-candidate scalar gathers (which cost ~800 ms/scene via XLA's default
    gather lowering);
  * queries are processed in static chunks via `lax.map`, bounding transient
    buffers to [chunk, P·nv];
  * k winners are found with k iterative masked argmins (k is 3; cheaper than
    a full sort) and only the k winning point indices are gathered.

If a query point's context contains no coarse point, its weights are all zero
(features propagate as zero and the skip connection carries the signal);
`grid_three_nn` returns a `found` mask so callers/tests can check coverage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gridgcn_tpu.ops.gridutil import context_neighbors
from gridgcn_tpu.ops.voxelize import build_voxel_table, voxel_ids

_FOUND_THRESH = 1e19
_BIG = 1e10       # masked-support distance sentinel (dense kNN paths)


def _topk_min(d2, k: int):
    """k iterative masked argmins over the last axis. Returns (vals, pos)."""
    vals, poss = [], []
    cur = d2
    for _ in range(k):
        pos = jnp.argmin(cur, axis=-1)
        val = jnp.take_along_axis(cur, pos[..., None], axis=-1)[..., 0]
        vals.append(val)
        poss.append(pos)
        cur = jnp.where(
            jax.nn.one_hot(pos, d2.shape[-1], dtype=bool), jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(poss, -1)


def _three_nn_one(q_xyz, q_mask, table, slot_idx, origin, vsize,
                  resolution: int, nv: int, k: int, context: int, chunk: int):
    Nq = q_xyz.shape[0]
    V = resolution ** 3
    P = context ** 3

    q_vid = voxel_ids(q_xyz, q_mask, origin, vsize, resolution)   # [Nq]

    chunk = min(chunk, Nq)
    n_chunks = -(-Nq // chunk)
    pad = n_chunks * chunk - Nq
    qx = jnp.pad(q_xyz, ((0, pad), (0, 0)))
    qv = jnp.pad(q_vid, (0, pad), constant_values=V)
    qx = qx.reshape(n_chunks, chunk, 3)
    qv = qv.reshape(n_chunks, chunk)

    def process(args):
        qc_xyz, qc_vid = args                                      # [C,3],[C]
        nvid, inb = context_neighbors(qc_vid, resolution, context)  # [C,P]
        nvid = jnp.where(inb, nvid, V)                 # sentinel row = BIG
        rows = table[nvid]                             # [C, P, 3*nv] row gather
        rows = rows.reshape(chunk, P, 3, nv)
        dx = rows[:, :, 0, :] - qc_xyz[:, 0, None, None]
        dy = rows[:, :, 1, :] - qc_xyz[:, 1, None, None]
        dz = rows[:, :, 2, :] - qc_xyz[:, 2, None, None]
        d2 = (dx * dx + dy * dy + dz * dz).reshape(chunk, P * nv)

        nn_d2, pos = _topk_min(d2, k)                              # [C,k]
        nn_valid = nn_d2 < _FOUND_THRESH
        # winner → (context voxel, slot) → point index: k tiny gathers
        win_vox = jnp.take_along_axis(nvid, pos // nv, axis=-1)    # [C,k]
        win_idx = jnp.maximum(slot_idx[jnp.minimum(win_vox, V - 1),
                                       pos % nv], 0)
        nn_idx = jnp.where(nn_valid, win_idx, 0)

        w = 1.0 / (nn_d2 + 1e-8)
        w = jnp.where(nn_valid, w, 0.0)
        w_sum = jnp.sum(w, axis=-1, keepdims=True)
        weights = jnp.where(w_sum > 0, w / jnp.maximum(w_sum, 1e-12), 0.0)
        return nn_idx, weights, jnp.any(nn_valid, axis=-1)

    if n_chunks == 1:
        nn_idx, weights, found = process((qx[0], qv[0]))
        return nn_idx[:Nq], weights[:Nq], found[:Nq]
    nn_idx, weights, found = jax.lax.map(process, (qx, qv))
    return (nn_idx.reshape(-1, k)[:Nq], weights.reshape(-1, k)[:Nq],
            found.reshape(-1)[:Nq])


def _dense_knn_one(q_xyz, q_mask, s_xyz, s_mask, k: int, block: int):
    """MXU brute-force k-NN: d² = |q|² + |s|² − 2 q·s, streamed over support
    blocks with a carried running top-k. The cross term is a matmul, so the
    pair enumeration rides the systolic array; the merge is k masked argmins
    per block. At decoder sizes (Nq ≤ 100K, Ns ≤ 16K) this beats any gather-
    based scheme on TPU — the grid path exists for larger supports."""
    Nq, Ns = q_xyz.shape[0], s_xyz.shape[0]
    block = min(block, Ns)
    n_blocks = -(-Ns // block)

    q2 = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)        # [Nq, 1]
    s_xyz_p = jnp.pad(s_xyz, ((0, n_blocks * block - Ns), (0, 0)))
    s_mask_p = jnp.pad(s_mask, (0, n_blocks * block - Ns))
    s_blocks = s_xyz_p.reshape(n_blocks, block, 3)
    m_blocks = s_mask_p.reshape(n_blocks, block)

    init_d = jnp.full((Nq, k), jnp.inf, q_xyz.dtype)
    init_i = jnp.zeros((Nq, k), jnp.int32)
    base_iota = jax.lax.broadcasted_iota(jnp.int32, (Nq, block), 1)

    def step(carry, inp):
        best_d, best_i = carry
        sb, mb, b = inp                                        # [B,3],[B],()
        s2 = jnp.sum(sb * sb, axis=-1)                         # [B]
        cross = q_xyz @ sb.T                                   # [Nq, B]  MXU
        d2 = q2 + s2[None, :] - 2.0 * cross
        d2 = jnp.where(mb[None, :], d2, jnp.inf)
        cat_d = jnp.concatenate([best_d, d2], axis=-1)         # [Nq, k+B]
        cat_i = jnp.concatenate([best_i, base_iota + b * block], axis=-1)
        nd, pos = _topk_min(cat_d, k)
        ni = jnp.take_along_axis(cat_i, pos, axis=-1)
        return (nd, ni), None

    (best_d, best_i), _ = jax.lax.scan(
        step, (init_d, init_i),
        (s_blocks, m_blocks, jnp.arange(n_blocks, dtype=jnp.int32)))

    nn_valid = jnp.isfinite(best_d) & q_mask[:, None]
    best_d = jnp.maximum(best_d, 0.0)   # guard fp-negative d²
    w = 1.0 / (best_d + 1e-8)
    w = jnp.where(nn_valid, w, 0.0)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    weights = jnp.where(w_sum > 0, w / jnp.maximum(w_sum, 1e-12), 0.0)
    return (jnp.where(nn_valid, best_i, 0), weights,
            jnp.any(nn_valid, axis=-1))


def _dense_knn_full_approx(q_xyz, q_mask, s_xyz, s_mask, k: int):
    """One-shot variant: full [Nq, Ns] distance matrix from a single MXU
    matmul, reduced with the TPU-native approx_min_k PartialReduce (~0.95
    recall per neighbor — occasionally the 4th-nearest stands in for the 3rd,
    which is noise relative to the grid query's own context-window
    approximation). ~10× faster than the exact scan at whole-scene sizes."""
    q2 = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)
    s2 = jnp.sum(s_xyz * s_xyz, axis=-1)
    cross = jnp.dot(q_xyz, s_xyz.T, preferred_element_type=jnp.float32)
    d2 = q2 + s2[None, :] - 2.0 * cross
    d2 = jnp.where(s_mask[None, :], d2, _BIG)

    # the [Nq, Ns] matrix is pure HBM traffic between the matmul and the
    # PartialReduce; bf16 halves it (≲1% weight perturbation at these scales)
    vals, idx = jax.lax.approx_min_k(d2.astype(jnp.bfloat16), k)
    best_d = jnp.maximum(vals.astype(jnp.float32), 0.0)  # guard fp-negative
    nn_valid = (best_d < _BIG * 0.5) & q_mask[:, None]
    w = jnp.where(nn_valid, 1.0 / (best_d + 1e-8), 0.0)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    weights = jnp.where(w_sum > 0, w / jnp.maximum(w_sum, 1e-12), 0.0)
    return (jnp.where(nn_valid, idx, 0), weights,
            jnp.any(nn_valid, axis=-1))


def dense_three_nn(query_xyz: jax.Array, query_mask: jax.Array,
                   support_xyz: jax.Array, support_mask: jax.Array,
                   k: int = 3, block: int = 2048, approx: bool = False):
    """k-NN + inverse-distance weights via MXU brute force (batched).

    approx=False: exact, streamed support blocks (never materializes
    [Nq, Ns]). approx=True: single matmul + approx_min_k (materializes the
    distance matrix; fastest on TPU when it fits HBM)."""
    if approx:
        return jax.vmap(lambda qx, qm, sx, sm: _dense_knn_full_approx(
            qx, qm, sx, sm, k))(
            query_xyz, query_mask, support_xyz, support_mask)
    return jax.vmap(lambda qx, qm, sx, sm: _dense_knn_one(
        qx, qm, sx, sm, k, block))(
        query_xyz, query_mask, support_xyz, support_mask)


def grid_three_nn(query_xyz: jax.Array, query_mask: jax.Array,
                  support_xyz: jax.Array, support_mask: jax.Array,
                  resolution: int, nv: int, key: jax.Array,
                  k: int = 3, context: int = 3, chunk: int = 8192):
    """Grid-indexed k-NN from each query point into the support set.

    Returns:
      nn_idx:  [B, Nq, k] int32 indices into support points (0-padded)
      weights: [B, Nq, k] inverse-distance weights (rows sum to 1 or 0)
      found:   [B, Nq] bool — at least one support point in context
    """
    table = build_voxel_table(support_xyz, support_mask, resolution, nv, key,
                              with_coords=True)
    return jax.vmap(
        lambda qx, qm, ct, sl, o, vs: _three_nn_one(
            qx, qm, ct, sl, o, vs, resolution, nv, k, context, chunk))(
        query_xyz, query_mask, table.coord_table, table.slots,
        table.origin, table.vsize)


# When True, the k neighbor-row gathers of three_nn_interpolate are issued
# as ONE gather at the consumer's [Nq, k] index space (experimental A/B knob;
# see docs/design.md §11 — the 3 separate gathers measure 1.57 ms/scene
# against a 1.05 ms descriptor-rate floor for the same 3·Nq rows).
_INTERP_COMBINED = True


def three_nn_interpolate(support_feat: jax.Array, nn_idx: jax.Array,
                         weights: jax.Array) -> jax.Array:
    """Inverse-distance feature interpolation: [B,Ns,C] → [B,Nq,C].

    Unrolled over k as fused gather-scale-adds: the einsum formulation
    materializes the [Nq, k, C] gathered tensor in HBM (~2.4 ms/scene at
    whole-scene sizes); k separate [Nq, C] row-gathers fuse with their
    multiply-accumulate and never build it."""
    def one(feat, idx, w):
        if _INTERP_COMBINED:
            # ONE gather at NEIGHBOR-MAJOR order: [k·Nq, C] with neighbor j's
            # rows contiguous at [j·Nq, (j+1)·Nq). The query-major [Nq, k, C]
            # form forces XLA to materialize a tiled reshape of the gather
            # output (rows of one query's k neighbors straddle (8,128)-tile
            # rows) — 63 MB written + re-read per whole scene, the top row of
            # the round-5 byte attribution (scripts/study_bytes.py). Leading-
            # dim slices of the neighbor-major form are layout-free views.
            Nq, k = idx.shape
            g = feat[idx.T.reshape(-1)]            # [k*Nq, C] one gather
            out = w[:, 0, None] * g[0:Nq]
            for j in range(1, k):                  # same add order as below
                out = out + w[:, j, None] * g[j * Nq:(j + 1) * Nq]
            return out
        out = w[:, 0:1] * feat[idx[:, 0]]
        for j in range(1, idx.shape[1]):
            out = out + w[:, j:j + 1] * feat[idx[:, j]]
        return out
    return jax.vmap(one)(support_feat, nn_idx, weights)

"""F-05: decoder-side upsample neighbor query (`gridify_up` equivalent).

For every point of the *denser* level, find its k nearest points of the
*coarser* level using the coarse level's voxel grid instead of a brute-force
O(Nq·Ns) 3-NN search (SURVEY §2.1 F-05, §3.4): candidates are the ≤ context³·nv
points stored in the query point's voxel context, so cost is O(Nq · P·nv) with
static shapes. Inverse-distance interpolation weights ride along for the
feature-propagation decoder (F-10), exactly PointNet++-style but grid-indexed.

If a query point's context contains no coarse point, its weights are all zero
(features propagate as zero and the skip connection carries the signal);
`grid_three_nn` returns a `found` mask so callers/tests can check coverage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gridgcn_tpu.ops.gridutil import context_neighbors
from gridgcn_tpu.ops.voxelize import build_voxel_table, voxel_ids

_BIG = 1e10


def _three_nn_one(q_xyz, q_mask, s_xyz, slots, origin, vsize,
                  resolution: int, k: int, context: int):
    Nq = q_xyz.shape[0]
    nv = slots.shape[-1]
    P = context ** 3

    q_vid = voxel_ids(q_xyz, q_mask, origin, vsize, resolution)   # [Nq]
    nvid, inb = context_neighbors(q_vid, resolution, context)      # [Nq, P]

    cand = slots[nvid].reshape(Nq, P * nv)                         # [Nq, P*nv]
    cand_valid = (cand >= 0) & jnp.repeat(inb, nv, axis=-1)
    cand_xyz = s_xyz[jnp.maximum(cand, 0)]                         # [Nq, P*nv, 3]

    d2 = jnp.sum((cand_xyz - q_xyz[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_valid, d2, _BIG)
    neg_top, pos = jax.lax.top_k(-d2, k)                           # [Nq, k]
    nn_d2 = -neg_top
    nn_idx = jnp.take_along_axis(cand, pos, axis=-1)
    nn_valid = nn_d2 < _BIG * 0.5

    w = 1.0 / (nn_d2 + 1e-8)
    w = jnp.where(nn_valid, w, 0.0)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    weights = jnp.where(w_sum > 0, w / jnp.maximum(w_sum, 1e-12), 0.0)
    return jnp.maximum(nn_idx, 0), weights, jnp.any(nn_valid, axis=-1)


def grid_three_nn(query_xyz: jax.Array, query_mask: jax.Array,
                  support_xyz: jax.Array, support_mask: jax.Array,
                  resolution: int, nv: int, key: jax.Array,
                  k: int = 3, context: int = 3):
    """Grid-indexed k-NN from each query point into the support set.

    Returns:
      nn_idx:  [B, Nq, k] int32 indices into support points (0-padded)
      weights: [B, Nq, k] inverse-distance weights (rows sum to 1 or 0)
      found:   [B, Nq] bool — at least one support point in context
    """
    table = build_voxel_table(support_xyz, support_mask, resolution, nv, key)
    B = query_xyz.shape[0]
    return jax.vmap(
        lambda qx, qm, sx, sl, o, vs: _three_nn_one(
            qx, qm, sx, sl, o, vs, resolution, k, context))(
        query_xyz, query_mask, support_xyz, table.slots,
        table.origin, table.vsize)


def three_nn_interpolate(support_feat: jax.Array, nn_idx: jax.Array,
                         weights: jax.Array) -> jax.Array:
    """Inverse-distance feature interpolation: [B,Ns,C] → [B,Nq,C]."""
    def one(feat, idx, w):
        return jnp.einsum("qk,qkc->qc", w, feat[idx])
    return jax.vmap(one)(support_feat, nn_idx, weights)

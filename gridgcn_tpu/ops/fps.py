"""Baseline samplers: farthest point sampling + ball query.

These are NOT used by GridConv — they exist (a) as the comparison baseline
for the paper's headline data-structuring speedup claim (CAGQ up to ~50×
faster than FPS + ball query, SURVEY §6; bench.py --compare-fps measures the
TPU equivalent), and (b) so PointNet++-lineage users migrating from the
reference find the familiar primitives.

FPS is inherently sequential (each pick depends on all previous picks): a
`lax.fori_loop` carrying the running min-distance field — exactly the O(N·M)
dependency chain CAGQ exists to avoid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def _fps_one(xyz, mask, M: int, start: jax.Array):
    N = xyz.shape[0]
    d_min = jnp.where(mask, _BIG, -1.0)        # masked points never picked

    def body(i, carry):
        idx, d_min, cur = carry
        idx = idx.at[i].set(cur)
        d_cur = jnp.sum((xyz - xyz[cur]) ** 2, axis=-1)
        d_min = jnp.minimum(d_min, jnp.where(mask, d_cur, -1.0))
        nxt = jnp.argmax(d_min).astype(jnp.int32)
        return idx, d_min, nxt

    idx0 = jnp.zeros((M,), jnp.int32)
    idx, _, _ = jax.lax.fori_loop(0, M, body, (idx0, d_min, start))
    return idx


def farthest_point_sampling(xyz: jax.Array, mask: jax.Array, M: int,
                            key: jax.Array) -> jax.Array:
    """FPS indices [B, M] (random valid start point per cloud)."""
    B, N = xyz.shape[:2]
    keys = jax.random.split(key, B)

    def start_one(m, k):
        score = jnp.where(m, jax.random.uniform(k, (N,)), -1.0)
        return jnp.argmax(score).astype(jnp.int32)

    starts = jax.vmap(start_one)(mask, keys)
    return jax.vmap(lambda x, m, s: _fps_one(x, m, M, s))(xyz, mask, starts)


def ball_query(xyz: jax.Array, mask: jax.Array, centers: jax.Array,
               radius: float, K: int, block: int = 4096):
    """For each center, up to K points within `radius` (first-found order).

    Returns (idx [B, M, K] int32, valid [B, M, K] bool). Streams the point
    dimension in blocks so [M, N] never materializes at whole-scene sizes.
    """
    r2 = radius * radius

    def one(x, m, c):
        N = x.shape[0]
        M = c.shape[0]
        nb = -(-N // block)
        xp = jnp.pad(x, ((0, nb * block - N), (0, 0)))
        mp = jnp.pad(m, (0, nb * block - N))

        def step(carry, b):
            idx, valid, count = carry
            xs = jax.lax.dynamic_slice_in_dim(xp, b * block, block, 0)
            ms = jax.lax.dynamic_slice_in_dim(mp, b * block, block, 0)
            d2 = (jnp.sum(c * c, -1, keepdims=True)
                  + jnp.sum(xs * xs, -1)[None, :]
                  - 2.0 * (c @ xs.T))                      # [M, block]
            hit = (d2 <= r2) & ms[None, :]
            # rank of each hit within its row, offset by already-found count
            rank = jnp.cumsum(hit, axis=-1) - 1 + count[:, None]
            write = hit & (rank < K)
            dest = jnp.where(write, rank, K)               # K = scratch slot
            rows = jnp.broadcast_to(jnp.arange(M)[:, None], dest.shape)
            src = jnp.broadcast_to(
                (jnp.arange(block) + b * block)[None, :], dest.shape)
            idx = idx.at[rows.reshape(-1), dest.reshape(-1)].set(
                src.reshape(-1).astype(jnp.int32), mode="drop")
            valid = valid.at[rows.reshape(-1), dest.reshape(-1)].set(
                write.reshape(-1), mode="drop")
            count = jnp.minimum(count + jnp.sum(hit, -1), K)
            return (idx, valid, count), None

        idx0 = jnp.zeros((M, K + 1), jnp.int32)
        val0 = jnp.zeros((M, K + 1), bool)
        (idx, valid, _), _ = jax.lax.scan(
            step, (idx0, val0, jnp.zeros((M,), jnp.int32)),
            jnp.arange(nb))
        return idx[:, :K], valid[:, :K]

    return jax.vmap(one)(xyz, mask, centers)

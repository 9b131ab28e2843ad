"""F-02 (RVS) and F-03 (CAS) group-center sampling (SURVEY.md §2.1).

RVS — Random Voxel Sampling: M occupied voxels uniformly at random. On TPU
this is a Gumbel top-k over the occupancy mask: one fused sort-like op instead
of the reference's compaction + random-index CUDA kernel (SURVEY §3.2 kernel B).

CAS — Coverage-Aware Sampling (paper §3.1): start from RVS; unselected
occupied voxels "challenge" randomly chosen incumbents and swap in when doing
so increases grid coverage, judged by
    H_add(c) = Σ_{u ∈ π(c)} 1[C_u == 0]   (coverage gained by adding c)
    H_rmv(i) = Σ_{u ∈ π(i)} 1[C_u == 1]   (coverage lost by removing i)
where C_u counts selected voxels whose context π covers u. The reference runs
this as a sequential CUDA loop; here it is a bounded `lax.scan` over
pre-sampled challengers carrying (selected, C) on device (SURVEY §7 H3). The
§4.2 property test asserts CAS covers ≥ voxels than RVS in expectation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gridgcn_tpu.ops.gridutil import context_neighbors
from gridgcn_tpu.ops.voxelize import VoxelTable

_NEG_INF = -1e30


def _rvs_one(occupied: jax.Array, M: int, key: jax.Array,
             approx: bool = False):
    """Uniform sample of M distinct occupied voxels via Gumbel top-k.

    `approx=True` uses the TPU-optimized approx_max_k PartialReduce instead
    of a full sort — the selection is random anyway, so a ~0.95-recall top-k
    is still a uniform sample (validity masks cover the rest)."""
    V = occupied.shape[0]
    g = jax.random.gumbel(key, (V,))
    score = jnp.where(occupied, g, _NEG_INF)
    if approx:
        vals, vids = jax.lax.approx_max_k(score, M)
    else:
        vals, vids = jax.lax.top_k(score, M)
    valid = vals > _NEG_INF * 0.5
    return vids.astype(jnp.int32), valid


def sample_centers_rvs(table: VoxelTable, M: int, key: jax.Array,
                       approx: bool = False):
    """Returns (center_vids [B, M] int32, center_valid [B, M] bool)."""
    B = table.coverage.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(lambda o, k: _rvs_one(o, M, k, approx))(
        table.coverage > 0, keys)


def _coverage_counts(sel_vids: jax.Array, sel_valid: jax.Array,
                     resolution: int, context: int) -> jax.Array:
    """C_u: number of selected voxels whose context covers voxel u. [V+1]."""
    V = resolution ** 3
    nvid, inb = context_neighbors(sel_vids, resolution, context)  # [M, P]
    dest = jnp.where(inb & sel_valid[:, None], nvid, V)
    return jnp.zeros((V + 1,), jnp.int32).at[dest.reshape(-1)].add(1)


def _cas_one(occupied: jax.Array, M: int, key: jax.Array,
             resolution: int, context: int, n_challenges: int):
    V = occupied.shape[0]
    k_init, k_chal, k_slot = jax.random.split(key, 3)

    sel_vids, sel_valid = _rvs_one(occupied, M, k_init)
    sel_mask = jnp.zeros((V + 1,), bool).at[
        jnp.where(sel_valid, sel_vids, V)].set(True)[:V]
    C = _coverage_counts(sel_vids, sel_valid, resolution, context)  # [V+1]

    # Challengers: random occupied voxels not selected at init. Sampled once
    # up front (Gumbel top-k) and walked in rounds; voxels that become
    # selected mid-scan are skipped via the live sel_mask.
    g = jax.random.gumbel(k_chal, (V,))
    chal_score = jnp.where(occupied & ~sel_mask, g, _NEG_INF)
    n_pool = min(V, max(n_challenges, 1))
    _, pool = jax.lax.top_k(chal_score, n_pool)
    pool_valid = (occupied & ~sel_mask)[pool]
    reps = -(-n_challenges // n_pool)
    challengers = jnp.tile(pool.astype(jnp.int32), reps)[:n_challenges]
    chal_ok = jnp.tile(pool_valid, reps)[:n_challenges]
    incumbent_slots = jax.random.randint(k_slot, (n_challenges,), 0, M)

    def step(carry, inp):
        sel_vids, sel_valid, sel_mask, C = carry
        c, ok, slot = inp
        i = sel_vids[slot]
        i_valid = sel_valid[slot]
        ok = ok & ~sel_mask[c] & i_valid

        c_nb, c_inb = context_neighbors(c, resolution, context)   # [P]
        i_nb, i_inb = context_neighbors(i, resolution, context)
        h_add = jnp.sum(jnp.where(c_inb, (C[c_nb] == 0).astype(jnp.int32), 0))
        h_rmv = jnp.sum(jnp.where(i_inb, (C[i_nb] == 1).astype(jnp.int32), 0))
        do_swap = ok & (h_add > h_rmv)

        dc = jnp.where(do_swap & c_inb, c_nb, V)
        di = jnp.where(do_swap & i_inb, i_nb, V)
        C = C.at[dc].add(1).at[di].add(-1)
        sel_vids = sel_vids.at[slot].set(jnp.where(do_swap, c, i))
        sel_mask = sel_mask.at[c].set(jnp.where(do_swap, True, sel_mask[c]))
        sel_mask = sel_mask.at[i].set(jnp.where(do_swap, False, sel_mask[i]))
        return (sel_vids, sel_valid, sel_mask, C), None

    (sel_vids, sel_valid, _, _), _ = jax.lax.scan(
        step, (sel_vids, sel_valid, sel_mask, C),
        (challengers, chal_ok, incumbent_slots))
    return sel_vids, sel_valid


def sample_centers_cas(table: VoxelTable, M: int, key: jax.Array,
                       context: int = 3, cas_iters: int = 1):
    """Coverage-Aware Sampling. Returns (center_vids, center_valid).

    `cas_iters` scales the challenge budget: n_challenges = cas_iters * M,
    bounding the sequential scan (SURVEY §7 H3). The result is approximate-CAS
    for small budgets but provably ≥ RVS coverage in expectation (tested).
    """
    B = table.coverage.shape[0]
    keys = jax.random.split(key, B)
    n_challenges = max(1, cas_iters * M)
    return jax.vmap(lambda o, k: _cas_one(
        o, M, k, table.resolution, context, n_challenges))(
            table.coverage > 0, keys)

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
this one challenge at a time on CUDA (Gauss-Seidel); here each round issues M
challenges in parallel against the round's starting coverage (Jacobi-style
batched greedy, SURVEY §7 H3) — `cas_iters` rounds of fully vectorized work.
The §4.2 property test asserts CAS covers ≥ voxels than RVS in expectation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from gridgcn_tpu.ops.voxelize import VoxelTable

_NEG_INF = -1e30


def _threshold_margin_ok(M: int) -> bool:
    """Threshold sampling keeps the binomial count under M via an M − 3√M
    safety margin; at M ≤ 9 the margin consumes ALL of M (p would clamp to
    0 and NO centers would be selected whenever n_occ > M). Static check —
    such small M falls back to the exact Gumbel top-k, which is cheap
    there anyway."""
    return M - 3.0 * float(M) ** 0.5 >= 1.0


def _rvs_one(occupied: jax.Array, M: int, key: jax.Array,
             approx: bool = False):
    """Uniform sample of M distinct occupied voxels.

    approx=False: exact Gumbel top-k (a full sort over V — the reference
    semantics, used at classifier scales).

    approx=True (whole-scene scale): threshold sampling — each occupied voxel
    independently kept with probability p chosen so the binomial count stays
    below M w.h.p., compacted into the M slots with a cumsum (sort-free; a
    top-k with k in the thousands degenerates into a V-wide sort on TPU).
    Yields an unbiased uniform subset of expected size M−3√M; the shortfall
    rides the center-validity mask like any other partially-filled capacity."""
    V = occupied.shape[0]
    if not approx or not _threshold_margin_ok(M):
        g = jax.random.gumbel(key, (V,))
        score = jnp.where(occupied, g, _NEG_INF)
        vals, vids = jax.lax.top_k(score, M)
        valid = vals > _NEG_INF * 0.5
        return vids.astype(jnp.int32), valid

    n_occ = jnp.sum(occupied)
    u = jax.random.uniform(key, (V,))
    p = jnp.clip((M - 3.0 * jnp.sqrt(float(M))) / jnp.maximum(n_occ, 1),
                 0.0, 1.0)
    sel = occupied & jnp.where(n_occ <= M, True, u < p)
    rank = jnp.cumsum(sel) - 1
    dest = jnp.where(sel & (rank < M), rank, M)
    vids = jnp.full((M + 1,), -1, jnp.int32).at[dest].set(
        jnp.arange(V, dtype=jnp.int32))[:M]
    valid = vids >= 0
    return jnp.maximum(vids, 0), valid


def _rvs_one_sorted(sorted_vid: jax.Array, V: int, M: int, key: jax.Array):
    """Threshold RVS over the voxel-sorted point array instead of the grid:
    occupied voxels are exactly the segment starts of sorted_vid [N], so the
    cumsum/compaction runs over N points, not V voxels (N ≪ V at whole-scene
    scale — resolution³ = 3.2× the point count there). Same distribution as
    `_rvs_one(approx=True)`: each occupied voxel kept i.i.d. with probability
    p, output in ascending-vid order."""
    N = sorted_vid.shape[0]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]])
    occ_start = is_start & (sorted_vid < V)
    n_occ = jnp.sum(occ_start)
    u = jax.random.uniform(key, (N,))
    p = jnp.clip((M - 3.0 * jnp.sqrt(float(M))) / jnp.maximum(n_occ, 1),
                 0.0, 1.0)
    sel = occ_start & jnp.where(n_occ <= M, True, u < p)
    rank = jnp.cumsum(sel) - 1
    dest = jnp.where(sel & (rank < M), rank, M)
    vids = jnp.full((M + 1,), -1, jnp.int32).at[dest].set(
        sorted_vid, mode="drop", unique_indices=True)[:M]
    valid = vids >= 0
    return jnp.maximum(vids, 0), valid


def sample_centers_rvs(table: VoxelTable, M: int, key: jax.Array,
                       approx: bool = False):
    """Returns (center_vids [B, M] int32, center_valid [B, M] bool)."""
    B = table.occupancy.shape[0]
    keys = jax.random.split(key, B)
    if approx and _threshold_margin_ok(M):
        V = table.num_voxels
        return jax.vmap(lambda sv, k: _rvs_one_sorted(sv, V, M, k))(
            table.sorted_vid, keys)
    # occupancy > 0 <=> coverage > 0 (occupancy = min(coverage, nv)); the
    # packed build (voxelize with_coverage=False) has no raw-coverage grid
    return jax.vmap(lambda o, k: _rvs_one(o, M, k, approx))(
        table.occupancy > 0, keys)


def _box_sum(x: jax.Array, resolution: int, context: int) -> jax.Array:
    """Sum of x over each voxel's context³ neighborhood, zero-padded at the
    grid boundary. x [V] → [V], via a separable context-tap stencil."""
    r = (context - 1) // 2
    R = resolution
    g = x.reshape(R, R, R)
    for axis in range(3):
        pad = [(r, r) if a == axis else (0, 0) for a in range(3)]
        gp = jnp.pad(g, pad)
        g = sum(jax.lax.slice_in_dim(gp, t, t + R, axis=axis)
                for t in range(context))
    return g.reshape(-1)


def _coverage_counts(sel_vids: jax.Array, sel_valid: jax.Array,
                     resolution: int, context: int) -> jax.Array:
    """C_u: number of selected voxels whose context covers voxel u. [V+1].

    One [M]-row scatter of the selected-voxel one-hot counts, then the
    context³ box stencil — instead of an [M, context³]-row scatter.
    sel_vids are distinct, so the scatter is a unique-index SET (collisions
    only at the discarded sentinel cell V) — XLA serializes colliding adds
    (~10× slower at scannet_seg scale, profiled)."""
    V = resolution ** 3
    sel = jnp.zeros((V + 1,), jnp.int32).at[
        jnp.where(sel_valid, sel_vids, V)].set(1, unique_indices=True)
    return jnp.concatenate(
        [_box_sum(sel[:V], resolution, context), jnp.zeros((1,), jnp.int32)])


def _cas_one(occupied: jax.Array, M: int, key: jax.Array,
             resolution: int, context: int, rounds: int,
             approx: bool = False, sorted_vid: jax.Array | None = None):
    """Batched-greedy CAS: each round pits M distinct challengers against a
    random permutation of incumbents and applies every winning swap at once
    (Jacobi-style — heuristics are evaluated against the round's starting
    coverage C). The reference's CUDA loop is one-challenge-at-a-time
    (Gauss-Seidel); the batched variant is the TPU-shaped approximation
    (SURVEY §7 H3) and the §4.2 property test keeps it honest: coverage must
    beat RVS in expectation.

    approx=True swaps the Gumbel top-k (a V-wide sort per use) for threshold
    sampling in BOTH the RVS init and the per-round challenger pick — the
    challenger set only needs to be a uniform random subset, so the ~3%
    expected shortfall just means slightly fewer challenges that round."""
    V = occupied.shape[0]
    k_init, k_rounds = jax.random.split(key)

    if approx and sorted_vid is not None and _threshold_margin_ok(M):
        sel_vids, sel_valid = _rvs_one_sorted(sorted_vid, V, M, k_init)
    else:
        sel_vids, sel_valid = _rvs_one(occupied, M, k_init, approx=approx)
    sel_mask = jnp.zeros((V + 1,), bool).at[
        jnp.where(sel_valid, sel_vids, V)].set(True)
    C = _coverage_counts(sel_vids, sel_valid, resolution, context)  # [V+1]

    def round_fn(carry, rkey):
        sel_vids, sel_valid, sel_mask, C = carry
        k_chal, k_perm = jax.random.split(rkey)

        avail = occupied & ~sel_mask[:V]
        if approx:
            chal, chal_ok = _rvs_one(avail, M, k_chal, approx=True)
        else:
            g = jax.random.gumbel(k_chal, (V,))
            _, chal = jax.lax.top_k(jnp.where(avail, g, _NEG_INF), M)
            chal = chal.astype(jnp.int32)
            chal_ok = avail[chal]

        slot = jax.random.permutation(k_perm, M)       # incumbent per chall.
        inc = sel_vids[slot]
        inc_valid = sel_valid[slot]

        # H_add / H_rmv are context³ box-sums of indicator maps — computing
        # them ONCE over the whole grid (separable k-tap stencil, O(V) VPU)
        # and gathering one value per challenger replaces two [M, P] gathers
        # per round (~9 ms/step at scannet_seg scale). Zero padding at the
        # grid boundary reproduces the in-bounds masking exactly.
        uncovered3 = _box_sum((C[:V] == 0).astype(jnp.int32),
                              resolution, context)
        once3 = _box_sum((C[:V] == 1).astype(jnp.int32), resolution, context)
        h_add = uncovered3[chal]
        h_rmv = once3[jnp.minimum(inc, V - 1)]
        swap = chal_ok & inc_valid & (h_add > h_rmv)

        # all scatters below have UNIQUE destinations (slot is a
        # permutation; winning challengers are distinct unselected voxels,
        # their incumbents distinct selected ones — disjoint sets; losers
        # collapse onto the discarded sentinel cell V), so they take XLA's
        # no-collision scatter path — the colliding-add form serialized at
        # ~5 M rows/s and cost ~3 ms/step at scannet_seg scale (profiled)
        sel_vids = sel_vids.at[slot].set(jnp.where(swap, chal, inc),
                                         unique_indices=True)
        sel_mask = sel_mask.at[jnp.where(swap, chal, V)].set(
            True, unique_indices=True)
        sel_mask = sel_mask.at[jnp.where(swap, inc, V)].set(
            False, unique_indices=True)
        # coverage update = box stencil of the swap deltas: two [M]-row
        # one-hot scatters + O(V) stencil work, instead of two
        # [M, context³]-row scatters (the dominant CAS cost at M≥512)
        delta = (jnp.zeros((V + 1,), jnp.int32)
                 .at[jnp.where(swap, chal, V)].set(1, unique_indices=True)
                 .at[jnp.where(swap, inc, V)].set(-1,
                                                  unique_indices=True))[:V]
        C = C.at[:V].add(_box_sum(delta, resolution, context))
        return (sel_vids, sel_valid, sel_mask, C), None

    (sel_vids, sel_valid, _, _), _ = jax.lax.scan(
        round_fn, (sel_vids, sel_valid, sel_mask, C),
        jax.random.split(k_rounds, max(1, rounds)))
    return sel_vids, sel_valid


def sample_centers_cas(table: VoxelTable, M: int, key: jax.Array,
                       context: int = 3, cas_iters: int = 1,
                       approx: bool = False):
    """Coverage-Aware Sampling. Returns (center_vids, center_valid).

    `cas_iters` = number of batched challenge rounds (each round issues M
    challenges in parallel). Approximate-CAS, provably ≥ RVS coverage in
    expectation (§4.2 property test). approx=True: sort-free threshold
    sampling for the init and challenger picks (see _cas_one).

    cas_iters=0 IS RVS by definition (CAS's initialization is random voxel
    sampling), so it dispatches to the plain RVS sampler — the CAS
    machinery (coverage stencils, challenger draws) otherwise costs
    ~0.97 ms/batch-16 even at zero rounds (round-5 decomposition,
    scripts/study_cas_premium.py)."""
    if cas_iters == 0:
        return sample_centers_rvs(table, M, key, approx=approx)
    B = table.occupancy.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(lambda o, k, sv: _cas_one(
        o, M, k, table.resolution, context, cas_iters, approx=approx,
        sorted_vid=sv))(table.occupancy > 0, keys, table.sorted_vid)

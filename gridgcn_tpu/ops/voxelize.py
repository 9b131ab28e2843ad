"""F-01: fixed-capacity voxel-table build (SURVEY.md §2.1).

The reference builds its voxel table with a CUDA kernel that atomically
appends each point into its voxel's slot array (SURVEY §3.2 kernel A). TPUs
have no atomics, so this implementation is **sort-based and race-free by
construction** (SURVEY §7 H2):

  1. shuffle points (random per-voxel retention, matching the reference's
     "random nv subset after input shuffle" semantics),
  2. stable-sort by voxel id (`jax.lax.sort` — fast on TPU),
  3. rank-within-segment via a cumulative max over segment starts,
  4. one scatter of `(voxel_id * nv + rank)` → point index / coordinates.

Everything is static-shape: the table is a dense `[V, nv]` index array in HBM
(V = resolution³), `coverage` keeps the *raw* per-voxel point count (the GCA
coverage weight, F-04/F-07), and `occupancy = min(coverage, nv)` counts stored
slots. Dropped points (rank ≥ nv) are a capacity choice surfaced by
`capacity_stats`, not a silent bug (SURVEY §7 H1).

Layout note (SURVEY §7 H4): alongside the index slots, point *coordinates*
are scattered into a packed `[V+1, 3·nv]` table (x-slots | y-slots | z-slots
per row; empty slots and the out-of-grid sentinel row V hold +BIG). Downstream
context queries (F-04 gather, F-05 upsample) then read coordinates as
contiguous row-gathers + dense VPU math instead of per-candidate scalar
gathers — on a v5e the scalar-gather formulation costs ~800 ms per 81920-pt
scene; the packed-row formulation is the difference between losing to and
beating the reference GPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gridgcn_tpu.ops.gridutil import vid_to_coords

COORD_SENTINEL = 1e10   # empty-slot coordinate; d2 to it ≈ 1e20


@struct.dataclass
class VoxelTable:
    """Fixed-capacity voxel table for one grid level.

    Attributes:
      slots:       [B, V, nv] int32 or None — indices into the level's
                   point array; -1 marks an empty slot (with_slots=True).
      key_table:   [B, V, nv] int32 or None — selection keys
                   [valid:1 | random | coverage code:6 | point index]
                   (coverage code: exact < 32, log-quantized above —
                   encode_coverage/decode_coverage),
                   precomputed so the F-04 approx path is run-gather + top_k
                   with zero post-selection gathers (with_keys=True).
                   Randomness is per-point (all centers rank a shared
                   candidate identically — the reference's per-voxel
                   retention semantics).
      key_table_pad: [B, pad_lo+V+pad_hi, nv] int32 or None — the SAME keys
                   scattered directly into a context-padded buffer
                   (key_pad=(pad_lo, pad_hi)); rows outside [pad_lo,
                   pad_lo+V) are zero = invalid. Lets F-04's context walk
                   skip its runtime pad-concat, whose T(1,128) fusion cost
                   0.63 ms/scene at whole-scene scale. key_table is a view
                   (slice) of this buffer when both are built.
      coord_table: [B, V+1, 3*nv] or None — packed slot coordinates
                   [x0..x_{nv-1} | y0.. | z0..]; empty slots and row V (the
                   out-of-grid sentinel) hold +COORD_SENTINEL. Built only
                   with `with_coords=True` (the F-05 grid query needs it;
                   F-04 does not — device traces showed its consumption
                   pipeline dominates, see ops/gather.py).
      coord_csum:  [B, N, 3] — INCLUSIVE cumulative sum of voxel-center
                   RESIDUALS (point − its voxel's center) in voxel-sorted
                   order. A voxel's stored-coordinate sum is the cumsum
                   difference over its first `occupancy` sorted rows, so
                   barycenters need two [M]-row gathers instead of a
                   colliding [N]-row scatter-add over the grid (~1.5 ms per
                   whole-scene build). Residuals are bounded by half a
                   voxel, so the f32 prefix sum carries no cancellation.
      seg_pos:     [B, V+1] int32 — position of each voxel's first sorted
                   point (0 for unoccupied; gate with occupancy).
      occupancy:   [B, V] int32 — number of stored points per voxel (≤ nv).
      coverage:    [B, V] int32 or None — raw number of points per voxel
                   (un-capped); consumed by the exact/slot gather path as
                   the GCA coverage weight. None for packed builds
                   (with_coverage=False): there the coverage weight rides
                   the selection keys, samplers test occupancy > 0, and the
                   build packs seg_pos+occupancy into ONE scatter instead
                   of two ([N]-row scatters are row-rate-bound,
                   ~0.35 ms each at whole-scene N — measured 14.46 →
                   14.01 ms/scene).
      point_vid:   [B, N] int32 — linear voxel id per input point (V for
                   invalid/padded points). Used by CAS and the upsample query.
      sorted_vid:  [B, N] int32 — voxel id per point in voxel-sorted order
                   (a free by-product of the sort-based build). Occupied
                   voxels are exactly the segment starts of this array, which
                   lets approx-RVS sample over N points instead of V voxels
                   (the V-wide cumsum + V-row compaction scatter cost
                   ~1.6 ms/scene at whole-scene scale).
      origin:      [B, 3] float — minimum corner of the grid.
      vsize:       [B, 3] float — voxel edge lengths.
      resolution:  static int — grid is resolution³ voxels.
      nv:          static int — slot capacity per voxel.
    """

    slots: jax.Array | None
    key_table: jax.Array | None
    coord_table: jax.Array | None
    coord_csum: jax.Array
    seg_pos: jax.Array
    occupancy: jax.Array
    coverage: jax.Array | None
    point_vid: jax.Array
    sorted_vid: jax.Array
    origin: jax.Array
    vsize: jax.Array
    resolution: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    key_table_pad: jax.Array | None = None
    # combined [rows, nv*4] selection table (slot-major [key|x|y|z] quads,
    # coords bitcast f32→i32) for the coord_match gather path
    sel_table_pad: jax.Array | None = None

    @property
    def num_voxels(self) -> int:
        return self.resolution ** 3


def voxel_ids(xyz: jax.Array, mask: jax.Array, origin: jax.Array,
              vsize: jax.Array, resolution: int) -> jax.Array:
    """Linear voxel id per point; invalid points get the sentinel id V."""
    V = resolution ** 3
    coords = jnp.floor((xyz - origin) / vsize).astype(jnp.int32)
    coords = jnp.clip(coords, 0, resolution - 1)
    vid = (coords[..., 0] * resolution + coords[..., 1]) * resolution + coords[..., 2]
    return jnp.where(mask, vid, V)


COV_BITS = 6
# selection-key valid flag sits at bit 29 (not 30): keys stay below
# 0x40000000 so a bitcast to f32 yields positive finite floats whose order
# matches the int order (approx_max_k-compatible); any key >= this is valid
VALID_KEY_MIN = 1 << 29


def encode_coverage(count: jax.Array) -> jax.Array:
    """6-bit coverage codec, encode side (VERDICT r1 weak #5).

    Hybrid: counts < 32 are stored EXACTLY (codes 0..31); larger counts use
    32 log-spaced codes at factor 2^(1/4) per step (codes 32..63), reaching
    32·2^(31/4) ≈ 6889 with ≤ 10% relative decode error — whole-scene voxel
    densities (hundreds of raw points) no longer saturate GCA's
    coverage-attention input the way the old linear min(count, 63) clamp
    did."""
    count = jnp.maximum(count, 0)
    logc = jnp.log2(jnp.maximum(count, 32).astype(jnp.float32) / 32.0)
    code_log = 32 + jnp.round(logc * 4.0).astype(jnp.int32)
    return jnp.where(count < 32, count, jnp.minimum(code_log, 63))


def decode_coverage(code: jax.Array) -> jax.Array:
    """Inverse of `encode_coverage` (exact below 32, ≤10% error above)."""
    approx = jnp.round(
        32.0 * jnp.exp2((code - 32).astype(jnp.float32) / 4.0)
    ).astype(jnp.int32)
    return jnp.where(code < 32, code, approx)


def grid_bounds(xyz: jax.Array, mask: jax.Array, resolution: int):
    """Per-cloud grid origin and voxel size from the valid-point bounding box."""
    big = jnp.asarray(jnp.finfo(xyz.dtype).max, xyz.dtype)
    lo = jnp.min(jnp.where(mask[..., None], xyz, big), axis=-2)
    hi = jnp.max(jnp.where(mask[..., None], xyz, -big), axis=-2)
    extent = jnp.maximum(hi - lo, 1e-4)
    # tiny inflation so points exactly at the max corner land inside the grid
    vsize = extent * (1.0 + 1e-5) / resolution
    return lo, vsize


def _build_one(xyz: jax.Array, mask: jax.Array, rand: jax.Array,
               resolution: int, nv: int, with_coords: bool, with_keys: bool,
               with_slots: bool, origin=None, vsize=None,
               key_pad: tuple[int, int] = (0, 0),
               sel_coords: bool = False, with_coverage: bool = True):
    """Single-cloud table build; vmapped over the batch."""
    N = xyz.shape[0]
    V = resolution ** 3

    if origin is None:
        origin, vsize = grid_bounds(xyz, mask, resolution)
    vid = voxel_ids(xyz, mask, origin, vsize, resolution)  # [N], V sentinel

    # ONE single-key sort: the uint32 key packs [voxel id | random bits], so
    # the first nv slots of each voxel are a uniform random subset — the
    # reference's shuffle-then-retain semantics (SURVEY §2.1 F-01) without a
    # permutation, a stable sort, or a second sort key. The sentinel id V
    # packs to the largest keys, so invalid points sort last.
    vid_bits = int(V).bit_length()          # V inclusive (sentinel)
    srand_bits = 32 - vid_bits              # ≥ 12 at any practical resolution
    skey = ((vid.astype(jnp.uint32) << srand_bits)
            | (rand >> vid_bits))
    pidx = jnp.arange(N, dtype=jnp.int32)
    sorted_skey, sorted_pidx = jax.lax.sort((skey, pidx), num_keys=1)
    sorted_vid = (sorted_skey >> srand_bits).astype(jnp.int32)

    idx = jnp.arange(N, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_start

    keep = (sorted_vid < V) & (rank < nv)
    dest = jnp.where(keep, sorted_vid * nv + rank, V * nv)

    # segment length (= raw voxel coverage) in sorted order without a
    # gather: the next segment start via a reversed cumulative min. All
    # slot-keyed scatters below have UNIQUE destinations by construction
    # (one slot per kept point; non-kept collapse onto one discarded
    # sentinel cell), so they take XLA's no-collision scatter path.
    nxt_src = jnp.where(
        jnp.concatenate([is_start[1:], jnp.ones((1,), bool)]),
        idx + 1, N)
    next_start = jnp.flip(jax.lax.cummin(jnp.flip(nxt_src)))
    seg_len = next_start - seg_start

    slots = None
    if with_slots:
        # 2-D (row, col) element scatter — a flat scatter + reshape pins a
        # 1-D layout the consumer gather must retile (measured 0.77 ms at
        # whole-scene scale on the key table; same lesson, design.md §11)
        slots = jax.lax.scatter(
            jnp.full((V, nv), -1, jnp.int32),
            jnp.stack([jnp.where(keep, sorted_vid, V),
                       jnp.minimum(rank, nv - 1)], axis=-1),
            sorted_pidx,
            jax.lax.ScatterDimensionNumbers((), (0, 1), (0, 1)),
            indices_are_sorted=False, unique_indices=True,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)

    key_table = None
    key_table_pad = None
    if with_keys:
        # precomputed selection keys (see VoxelTable docstring)
        # the valid flag sits at bit 29 (not 30) so every key stays below
        # 0x40000000 — bitcast to f32 the keys are positive FINITE floats
        # whose ordering matches the int ordering, which lets the selection
        # run through approx_max_k (PartialReduce) instead of a full sort
        idx_bits = max(1, int(N - 1).bit_length())
        cov_bits = COV_BITS
        if idx_bits + cov_bits + 1 > 29:
            # the layout is [valid:1 @29 | rand | coverage:6 | index]; with
            # no headroom left the rand bit would alias the valid bit and
            # dropped points would masquerade as selectable (static shape
            # check — N is a trace-time constant)
            raise ValueError(
                f"selection-key packing supports at most 2^{29 - cov_bits - 1}"
                f" points per cloud (N={N}); shard the cloud (parallel/"
                f"resident) or disable with_keys for larger inputs")
        rand_bits = max(1, 29 - idx_bits - cov_bits)
        cov_q = encode_coverage(seg_len)
        # random selection-key bits: reuse the top of the packed sort key's
        # random field (srand_bits ≥ rand_bits holds at practical N/V)
        rbits = ((sorted_skey >> max(srand_bits - rand_bits, 0))
                 & ((1 << rand_bits) - 1)).astype(jnp.int32)
        keys = ((keep.astype(jnp.int32) << 29)
                | (rbits << (idx_bits + cov_bits))
                | (cov_q << idx_bits) | sorted_pidx)
        # scatter straight into a context-padded buffer when the consumer's
        # pad geometry is known (key_pad=(lo, hi)): the pad rows stay zero
        # (= invalid key), so F-04 skips its runtime pad-concat entirely
        lo, hi = key_pad
        rows = lo + V + hi
        kdest = jnp.where(keep, dest + lo * nv, rows * nv)
        if not sel_coords:
            # 2-D element scatter straight into the [rows, nv] table shape:
            # the flat-scatter + reshape form pays a 0.77 ms/scene retile
            # (T(1024) 1-D -> the context slice-gather's T(1,128) operand
            # layout); scattering at (row, col) lets XLA produce the
            # consumer layout directly. OOB row (= rows) drops non-kept
            # points via FILL_OR_DROP.
            krow = jnp.where(keep, sorted_vid + lo, rows)
            kcol = jnp.minimum(rank, nv - 1)
            key_table_pad = jax.lax.scatter(
                jnp.zeros((rows, nv), jnp.int32),
                jnp.stack([krow, kcol], -1), keys,
                jax.lax.ScatterDimensionNumbers((), (0, 1), (0, 1)),
                indices_are_sorted=False, unique_indices=True,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
            key_table = key_table_pad[lo:lo + V]
            if lo == 0 and hi == 0:
                key_table_pad = None

    coords = xyz[sorted_pidx]                                    # [N, 3]

    sel_table_pad = None
    if with_keys and sel_coords:
        # Combined selection table [rows, 128]: each voxel's row carries up
        # to 32 slot quads [key | x | y | z] (coords bitcast f32→i32) at
        # col = slot*4 — exactly one native 128-lane row per voxel, so the
        # scatter needs no lane padding (a [*, 4]-shaped operand would be
        # tiled 4→128, a 32× write blowup) and the consumer's context-run
        # gather is a clean (context, 128) dynamic slice with no relayout.
        # One window-4 row scatter — scatter cost is ROW-rate-bound, so
        # carrying the coordinates is free. This is what kills the
        # post-selection [M·K]-row winner-coords gather (docs/design.md §8
        # parked lead, landed via one-hot key-match extraction in
        # ops/gather.py).
        if nv > 32:
            raise ValueError(f"sel_coords supports nv <= 32, got {nv}")
        cbits = jax.lax.bitcast_convert_type(
            coords.astype(jnp.float32), jnp.int32)               # [N, 3]
        # 4N-value ELEMENT scatter at 2-D (row, col) destinations. The
        # obvious window-4 scatter (update_window_dims) SERIALIZES in
        # XLA:TPU (~287 ms at whole-scene N — measured, docs/design.md
        # §10); element scatters at the consumer's dimensionality run at
        # the DMA row rate and need no relayout (§11).
        vrow4 = jnp.tile(jnp.where(keep, sorted_vid + lo, rows), 4)
        colb = jnp.minimum(rank, nv - 1) * 4
        cols4 = jnp.concatenate([colb, colb + 1, colb + 2, colb + 3])
        vals4 = jnp.concatenate(
            [keys, cbits[:, 0], cbits[:, 1], cbits[:, 2]])
        sel_table_pad = jax.lax.scatter(
            jnp.zeros((rows, 128), jnp.int32),
            jnp.stack([vrow4, cols4], axis=-1), vals4,
            jax.lax.ScatterDimensionNumbers((), (0, 1), (0, 1)),
            indices_are_sorted=False, unique_indices=True,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
        # key-only view for samplers/tests (strided slice; only
        # materialized if consumed)
        key_table = sel_table_pad.reshape(rows, 32, 4)[lo:lo + V, :nv, 0]

    # Barycenter inputs (see VoxelTable.coord_csum): prefix sums of
    # voxel-center residuals in sorted order. Residuals are ≤ vsize/2 per
    # axis (in-voxel by construction), so the f32 running sum stays
    # cancellation-free; the old [3, V+1] colliding scatter-add cost
    # ~1.5 ms/scene (XLA serializes colliding adds).
    svid_safe = jnp.minimum(sorted_vid, V - 1)
    sx_, sy_, sz_ = vid_to_coords(svid_safe, resolution)
    vcenter = (jnp.stack([sx_, sy_, sz_], -1).astype(xyz.dtype) + 0.5) \
        * vsize + origin
    coord_csum = jnp.cumsum(coords - vcenter, axis=0)            # [N, 3]

    coord_table = None
    if with_coords:
        # packed coordinate table, scattered directly in its final
        # [V+1, 3*nv] = [x-slots | y-slots | z-slots] layout: axis a of the
        # point at (voxel, rank) lands at vid*3nv + a*nv + rank.
        # 2-D (row, col) destinations for the same layout reason as slots
        # above; non-kept points get row V+1 (OOB) and are dropped
        crow3 = jnp.tile(jnp.where(keep, sorted_vid, V + 1), 3)
        col_base = jnp.minimum(rank, nv - 1)
        ccol3 = jnp.concatenate(
            [col_base, col_base + nv, col_base + 2 * nv])
        vals3 = jnp.concatenate([coords[:, 0], coords[:, 1], coords[:, 2]])
        coord_table = jax.lax.scatter(
            jnp.full((V + 1, 3 * nv), COORD_SENTINEL, xyz.dtype),
            jnp.stack([crow3, ccol3], axis=-1), vals3,
            jax.lax.ScatterDimensionNumbers((), (0, 1), (0, 1)),
            indices_are_sorted=False, unique_indices=True,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)

    # raw per-voxel point count + first-sorted-row position from the
    # segment boundaries: two scatter-SETs of unique segment starts instead
    # of colliding [N]-row scatter-adds. (A single packed [V+1, 2] scatter
    # profiled ~40% slower than the two 1-D scatters plus needed an unpack.)
    start_dest = jnp.where(is_start & (sorted_vid < V), sorted_vid, V)
    if with_coverage:
        coverage = jnp.zeros((V + 1,), jnp.int32).at[start_dest].set(
            seg_len, unique_indices=True)[:V]
        seg_pos = jnp.zeros((V + 1,), jnp.int32).at[start_dest].set(
            seg_start, unique_indices=True)
        occupancy = jnp.minimum(coverage, nv)
    else:
        # packed-path consumers only ever read occupancy (= coverage clamped
        # at nv; samplers test > 0, barycenters count stored rows) and
        # seg_pos, which fit one int32 together — ONE [N]-row scatter
        # instead of two (scatters are row-rate-bound, ~0.35 ms each at
        # whole-scene N). Raw GCA coverage still flows through the
        # selection keys; grid-shaped raw coverage is only needed by the
        # exact/slot path and diagnostics (capacity_stats reconstructs
        # totals from point_vid).
        occ_bits = int(nv).bit_length()
        packed = (seg_start << occ_bits) | jnp.minimum(seg_len, nv)
        posocc = jnp.zeros((V + 1,), jnp.int32).at[start_dest].set(
            packed, unique_indices=True)
        seg_pos = posocc >> occ_bits
        occupancy = (posocc & ((1 << occ_bits) - 1))[:V]
        coverage = None
    return (slots, key_table, key_table_pad, coord_table, coord_csum,
            seg_pos, occupancy, coverage, vid, sorted_vid, origin, vsize,
            sel_table_pad)


def build_voxel_table(xyz: jax.Array, mask: jax.Array, resolution: int,
                      nv: int, key: jax.Array, with_coords: bool = False,
                      with_keys: bool = False, with_slots: bool = True,
                      bounds=None,
                      key_pad: tuple[int, int] = (0, 0),
                      sel_coords: bool = False,
                      with_coverage: bool = True) -> VoxelTable:
    """Build fixed-capacity voxel tables for a batch of point clouds.

    Args:
      xyz:  [B, N, 3] point positions.
      mask: [B, N] bool validity (padded points False).
      resolution: grid edge; V = resolution³ voxels.
      nv: per-voxel slot capacity.
      key: PRNG key driving the random slot-retention shuffle.
      with_coords: also build the packed [V+1, 3nv] coordinate table
        (needed by the F-05 grid query; skipped by F-04).
      with_keys: also build the precomputed selection-key table (used by
        the F-04 approx path).
      with_slots: build the index slot table (the F-04 approx path reads
        indices out of key_table instead, saving the scatter).
      bounds: optional (origin [B, 3], vsize [B, 3]) fixing the grid
        explicitly instead of deriving it from the cloud's bounding box —
        required by spatial sharding (F-22), where every shard's voxel
        planes must align on the GLOBAL grid.
    """
    B, N = xyz.shape[:2]
    rand = jax.random.bits(key, (B, N))   # random per-voxel retention order
    if bounds is not None:
        (slots, ktab, ktab_p, ctab, csum, spos, occ, cov, vid, svid, origin,
         vsize, stab) = jax.vmap(
            lambda x, m, r, o, vs: _build_one(
                x, m, r, resolution, nv, with_coords, with_keys, with_slots,
                origin=o, vsize=vs, key_pad=key_pad, sel_coords=sel_coords,
                with_coverage=with_coverage))(
            xyz, mask, rand, bounds[0], bounds[1])
    else:
        (slots, ktab, ktab_p, ctab, csum, spos, occ, cov, vid, svid, origin,
         vsize, stab) = jax.vmap(
            lambda x, m, r: _build_one(x, m, r, resolution, nv, with_coords,
                                       with_keys, with_slots,
                                       key_pad=key_pad,
                                       sel_coords=sel_coords,
                                       with_coverage=with_coverage))(
            xyz, mask, rand)
    return VoxelTable(slots=slots, key_table=ktab, coord_table=ctab,
                      coord_csum=csum, seg_pos=spos, occupancy=occ,
                      coverage=cov, point_vid=vid, sorted_vid=svid,
                      origin=origin, vsize=vsize, resolution=resolution,
                      nv=nv, key_table_pad=ktab_p, sel_table_pad=stab)


def capacity_stats(table: VoxelTable) -> dict:
    """Diagnostics for SURVEY §7 H1: how many points the capacity nv dropped."""
    stored = jnp.sum(table.occupancy, axis=-1)
    if table.coverage is not None:
        total = jnp.sum(table.coverage, axis=-1)
    else:
        # packed builds (with_coverage=False) drop the raw-coverage grid;
        # the valid-point total is recoverable from the per-point voxel ids
        total = jnp.sum(table.point_vid < table.num_voxels, axis=-1)
    dropped = total - stored
    return {
        "stored_points": stored,
        "total_points": total,
        "dropped_points": dropped,
        "dropped_frac": dropped / jnp.maximum(total, 1),
        "occupied_voxels": jnp.sum(table.occupancy > 0, axis=-1),
    }


def slots_from_keys(key_table: jax.Array, n_points: int) -> jax.Array:
    """Recover the slot index table from a packed key table ([..., V, nv]).

    Keys pack [valid:1 | random | coverage:6 | point index]; the point index
    occupies the low bits. Returns int32 slots with -1 for empty, matching
    build_voxel_table(with_slots=True) for the same build key."""
    idx_bits = max(1, int(n_points - 1).bit_length())
    valid = key_table >= (1 << 29)
    return jnp.where(valid, key_table & ((1 << idx_bits) - 1), -1)

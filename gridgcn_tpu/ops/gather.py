"""F-04: per-center node-point gather over the voxel context (SURVEY.md §2.1).

The reference's CUDA kernel C walks the context neighborhood π(v) of each
center voxel and emits ≤ K node-point indices, a validity mask, and per-node
coverage weights (SURVEY §3.2). Here the walk is a dense static-shape gather:

  candidates[M, P·nv] = slots[π(center)]       (P = context³)
  node selection      = top-K of (mask-gated random scores)

so node points are a uniform random K-subset of the valid candidates — the
same semantics as the reference's randomized retention, fully deterministic
under the PRNG key (SURVEY §7 H6). All outputs are padded/masked to static
shapes for XLA.

TPU layout (SURVEY §7 H4, validated by device traces): candidate indices and
coverage come from contiguous 3-row-run gathers over the padded tables (the
gathers themselves cost <1 ms/layer); winner coordinates are fetched AFTER
selection with one small [winners → xyz] gather. Selecting coordinates from
packed candidate rows (per-axis take_along_axis) looks cheaper on paper but
costs ~14 ms/layer in XLA's lowering. Center barycenters come from the
per-voxel coordinate sums; the packed coord_table serves only the F-05 grid
query.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gridgcn_tpu.ops.gridutil import (
    context_neighbors, context_offsets, vid_to_coords)
from gridgcn_tpu.ops.voxelize import (
    COV_BITS, VALID_KEY_MIN, VoxelTable, decode_coverage)


@struct.dataclass
class GroupedNodes:
    """CAGQ grouping output consumed by GCA (one GridConv layer).

    Attributes:
      neighbor_idx:  [B, M, K] int32 — indices into the level's point array
                     (0 where invalid; gate with neighbor_mask).
      neighbor_mask: [B, M, K] bool.
      node_xyz:      [B, M, K, 3] — node coordinates (0 where invalid).
      node_coverage: [B, M, K] int32 — raw point count of each node's voxel,
                     the GCA coverage weight (F-07).
      center_xyz:    [B, M, 3].
      center_valid:  [B, M] bool.
      center_vids:   [B, M] int32 — linear voxel id of each center.
    """

    neighbor_idx: jax.Array
    neighbor_mask: jax.Array
    node_xyz: jax.Array
    node_coverage: jax.Array
    center_xyz: jax.Array
    center_valid: jax.Array
    center_vids: jax.Array
    cand_idx: jax.Array | None = None     # [B, M, P*nv] all context points
    cand_valid: jax.Array | None = None   # (return_candidates=True only)


def _gather_one(slots, key_table, key_table_pad, sel_table_pad,
                coord_csum, seg_pos, occupancy, coverage,
                xyz, center_vids, center_valid, key, resolution: int, K: int,
                context: int, center_mode: str, origin, vsize,
                approx: bool = False, return_candidates: bool = False,
                approx_topk: bool = False, use_z_window: bool = False,
                coord_payload: bool = False):
    """Single-cloud gather; vmapped over the batch."""
    V = resolution ** 3
    if slots is not None:
        nv = slots.shape[-1]
    elif key_table is not None:
        # the TRUE capacity — sel_table_pad always carries 32 slot quads
        # per row (lane alignment), so its width would overstate nv and
        # quadruple the selection pool with always-empty slots
        nv = key_table.shape[-1]
    else:
        raise ValueError(
            "cannot derive nv: need slots or key_table (sel_table_pad's "
            "lane-aligned width is always 32 quads regardless of nv)")
    M = center_vids.shape[0]
    P = context ** 3

    nvid, inb = context_neighbors(center_vids, resolution, context)  # [M, P]
    inb = inb & center_valid[:, None]

    # Context rows along z are ADJACENT table rows (linear id = ((x*R)+y)*R+z),
    # so the 3×3×3 walk is 9 contiguous 3-row runs instead of 27 row gathers —
    # one lax.gather with slice size (context, row) per table, 3× fewer
    # gathered rows (SURVEY §7 H4). Run order (dx slowest, dz fastest) matches
    # context_neighbors' flat order, so downstream indexing is unchanged.
    r = (context - 1) // 2
    P2 = context * context
    offs2 = context_offsets(context).reshape(P2, context, 3)[:, 0, :2]  # (dx,dy)
    d2lin = jnp.asarray(offs2[:, 0] * resolution * resolution
                        + offs2[:, 1] * resolution, jnp.int32)  # [P2]
    # Tables padded with r sentinel rows on top + context rows below, so a
    # run starting at (vid + d2lin - r) maps to padded index (vid + d2lin),
    # which is ≥ 0 for every in-bounds (dx, dy); the clip only moves runs of
    # fully-masked pairs (out-of-grid (dx,dy) or sentinel centers).
    base = jnp.minimum(center_vids, V)[:, None] + d2lin[None, :]
    base = jnp.clip(base, 0, r + V)

    # K may exceed the candidate pool (small context/nv configs): select
    # min(K, P·nv), pad as invalid.
    kk = min(K, P * nv)
    N_pts = xyz.shape[0]
    idx_bits = max(1, int(N_pts - 1).bit_length())
    flat_base = base.reshape(-1)

    def run_gather(padded):
        # Each (dx, dy) context pair is a `context`-row run of ADJACENT
        # table rows. Two lowerings:
        #  * z-window (batched path): pre-concatenate the window — row b of
        #    the derived table holds padded rows b..b+context-1 flattened —
        #    so a run is ONE standard-layout row gather. Under vmap the
        #    slice-gather below picks a {2,0,1} layout whose relayout
        #    copies cost ~1.6 ms/step on scannet_seg traces; the windowed
        #    build is a contiguous concat at HBM speed (measured 35.2 →
        #    31.5 ms/step). At B=1 the window build (~V·context·nv extra
        #    traffic) costs more than the single cheap copy it replaces
        #    (whole-scene 15.5 → 16.5 ms/scene), hence the gate.
        #  * slice-gather (B=1 path): one lax.gather with slice size
        #    (context, row) — 3× fewer gathered rows than per-voxel rows.
        if use_z_window:
            w = padded.shape[0] - context + 1
            windowed = jnp.concatenate(
                [padded[i:i + w] for i in range(context)], axis=1)
            return windowed[flat_base]
        return jax.vmap(lambda b: jax.lax.dynamic_slice_in_dim(
            padded, b, context, 0))(flat_base)

    def fetch_sel_runs():
        # [key | x | y | z] quads from the combined selection table, masked
        # to in-bounds context pairs; the table is lane-aligned to 32 slot
        # quads per row regardless of nv
        runs = run_gather(sel_table_pad).reshape(M, P2, context, 32, 4)
        if nv < 32:
            runs = runs[:, :, :, :nv]       # drop always-empty slot quads
        runs = runs.reshape(M, P, nv, 4)
        return jnp.where(inb[..., None, None], runs, 0)

    def pad_to_K(a):
        # selection produced kk = min(K, P·nv) winners; pad out as invalid
        if kk >= K:
            return a
        return jnp.pad(a, ((0, 0), (0, K - kk)) + ((0, 0),) * (a.ndim - 2))

    def decode_keys(keys):
        # packed selection key [valid | random | log-coverage | point index]
        # (layout + codec from voxelize.py) → (valid, point index, coverage)
        mask = keys >= VALID_KEY_MIN
        idx = jnp.where(mask, keys & ((1 << idx_bits) - 1), 0)
        cov = jnp.where(mask, decode_coverage(
            (keys >> idx_bits) & ((1 << COV_BITS) - 1)), 0)
        return mask, idx, cov

    def select_top_keys(flat_keys):
        if approx_topk:
            # keys bitcast to positive finite floats whose order matches the
            # int order (see VALID_KEY_MIN), so the random-subset selection
            # can ride approx_max_k's PartialReduce instead of a full row
            # sort. ~0.95 recall per slot — a different random subset, which
            # is exactly what the selection is anyway.
            vals, _ = jax.lax.approx_max_k(
                jax.lax.bitcast_convert_type(flat_keys, jnp.float32), kk)
            return jax.lax.bitcast_convert_type(vals, jnp.int32)
        return jax.lax.top_k(flat_keys, kk)[0]

    if approx and sel_table_pad is not None and coord_payload:
        # Combined-table payload path (coord_payload): the context-run
        # gather fetches [key | x | y | z] quads and the node selection is
        # a 4-operand descending lax.sort — the sort RETURNS the winner
        # coordinates, so the post-selection [B·M·K]-row winner gather
        # disappears. Keys embed the point index so they are unique: the
        # sorted order — and hence every output — is bit-identical to the
        # packed top_k path (test_coord_payload_is_bit_exact). MEASURED
        # SLOWER than the winner gather at every preset's V/M ratio
        # (docs/design.md §10 addendum) — kept flag-off as the tested
        # artifact of that study.
        runs = fetch_sel_runs()
        cand_keys = runs[..., 0].reshape(M, P * nv)
        # descending-by-key == ascending-by-~key: valid keys (bit 29 set)
        # map to the most-negative ~keys and surface first; empty slots
        # (key 0) map to -1 and sink behind every valid key
        sk, sx_, sy_, sz_ = jax.lax.sort(
            (jnp.bitwise_not(cand_keys),
             runs[..., 1].reshape(M, P * nv),
             runs[..., 2].reshape(M, P * nv),
             runs[..., 3].reshape(M, P * nv)),
            dimension=-1, num_keys=1)
        top_keys = pad_to_K(jnp.bitwise_not(sk[:, :kk]))
        node_xyz = pad_to_K(jax.lax.bitcast_convert_type(
            jnp.stack([sx_[:, :kk], sy_[:, :kk], sz_[:, :kk]], axis=-1),
            jnp.float32))
        neighbor_mask, neighbor_idx, node_coverage = decode_keys(top_keys)
        node_xyz = jnp.where(neighbor_mask[..., None], node_xyz, 0.0)
        center_xyz = center_positions(
            coord_csum, seg_pos, occupancy, center_vids, center_valid,
            resolution, center_mode, origin, vsize)
        out = (neighbor_idx, neighbor_mask, node_xyz, node_coverage,
               center_xyz)
        if return_candidates:
            cand_valid, cand_idx, _ = decode_keys(cand_keys)
            out = out + (cand_idx, cand_valid)
        return out

    if approx and sel_table_pad is not None:
        # Combined-table path (coord_match): ONE context-run gather fetches
        # [key | x | y | z] quads (row-rate-bound, so 4x width is free;
        # the [rows, 128] table needs no relayout — see voxelize.py);
        # after top-k, winner coordinates come from an EXACT one-hot
        # key-match einsum instead of a [M*K]-row gather — selection keys
        # are unique (they embed the point index), so each valid winner
        # matches exactly one candidate, and coordinates ride as bf16
        # triple-splits (8+8+8 >= 24 mantissa bits => bit-exact f32).
        runs = fetch_sel_runs()
        cand_keys = runs[..., 0].reshape(M, P * nv)
        top_keys = pad_to_K(select_top_keys(cand_keys))
        neighbor_mask, neighbor_idx, node_coverage = decode_keys(top_keys)

        cand_xyz = jax.lax.bitcast_convert_type(
            runs[..., 1:4].reshape(M, P * nv, 3), jnp.float32)
        # exact bf16 triple-split (lax.reduce_precision, NOT a bf16
        # round-trip — XLA's simplifier folds those; see knn.py)
        hi = jax.lax.reduce_precision(cand_xyz, 8, 7)
        r1 = cand_xyz - hi
        mid = jax.lax.reduce_precision(r1, 8, 7)
        lo_ = (r1 - mid).astype(jnp.bfloat16)
        terms = jnp.concatenate(
            [hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo_],
            axis=-1)                                   # [M, C, 9]
        eq = (top_keys[:, :, None] == cand_keys[:, None, :])             & neighbor_mask[..., None]
        got = jnp.einsum("mkc,mcd->mkd", eq.astype(jnp.bfloat16), terms,
                         preferred_element_type=jnp.float32)
        node_xyz = (got[..., 0:3] + got[..., 3:6]) + got[..., 6:9]
        node_xyz = jnp.where(neighbor_mask[..., None], node_xyz, 0.0)

        cand_valid, cand_idx, _ = decode_keys(cand_keys)
        center_xyz = center_positions(
            coord_csum, seg_pos, occupancy, center_vids, center_valid,
            resolution, center_mode, origin, vsize)
        out = (neighbor_idx, neighbor_mask, node_xyz, node_coverage,
               center_xyz)
        if return_candidates:
            out = out + (cand_idx, cand_valid)
        return out

    if approx and key_table is not None:
        # Packed-key selection: the voxel table carries precomputed int32
        # keys [valid | random | log-coverage | point index] (voxelize.py),
        # so this whole stage is ONE run gather + top_k — the sort returns
        # winners WITH their payload. A take_along-based selection costs
        # ~2.5 ms per [8K, 432] array in XLA's lowering (profiled); the
        # top_k itself is ~0.5 ms.
        if key_table_pad is not None and \
                key_table_pad.shape[0] == r + V + context:
            keys_p = key_table_pad   # pre-padded by the voxelize scatter
        else:
            keys_p = jnp.concatenate(
                [jnp.zeros((r, nv), key_table.dtype), key_table,
                 jnp.zeros((context, nv), key_table.dtype)], axis=0)
        cand_keys = run_gather(keys_p).reshape(M, P, nv)
        cand_keys = jnp.where(inb[..., None], cand_keys, 0)
        flat_keys = cand_keys.reshape(M, P * nv)
        top_keys = pad_to_K(select_top_keys(flat_keys))
        neighbor_mask, neighbor_idx, node_coverage = decode_keys(top_keys)
        cand_valid, cand_idx, _ = decode_keys(flat_keys)
    else:
        # exact path: coverage rides as an extra column of the slots table
        # so the context walk is one run gather; float scores in (1, 2),
        # invalid 0 — uniform among valid.
        slots_cov = jnp.concatenate([slots, coverage[:, None]], axis=1)
        slots_p = jnp.concatenate(
            [jnp.full((r, nv + 1), -1, slots.dtype), slots_cov,
             jnp.full((context, nv + 1), -1, slots.dtype)], axis=0)
        runs = run_gather(slots_p).reshape(M, P, nv + 1)
        cand_idx = runs[..., :nv]
        cand_cov = jnp.maximum(runs[..., nv], 0)
        cand_valid = (cand_idx >= 0) & inb[..., None]

        cand_idx = cand_idx.reshape(M, P * nv)
        cand_valid = cand_valid.reshape(M, P * nv)
        cand_cov = jnp.where(inb, cand_cov, 0)
        cand_cov = jnp.broadcast_to(
            cand_cov[..., None], (M, P, nv)).reshape(M, P * nv)

        rscore = jax.random.uniform(key, (M, P * nv))
        score = jnp.where(cand_valid, 1.0 + rscore, 0.0)
        top_score, top_pos = jax.lax.top_k(score, kk)        # [M, kk]
        if kk < K:
            top_score = jnp.pad(top_score, ((0, 0), (0, K - kk)))
            top_pos = jnp.pad(top_pos, ((0, 0), (0, K - kk)))
        neighbor_mask = top_score > 0.5
        neighbor_idx = jnp.take_along_axis(cand_idx, top_pos, axis=-1)
        neighbor_idx = jnp.where(neighbor_mask, neighbor_idx, 0)
        node_coverage = jnp.where(
            neighbor_mask, jnp.take_along_axis(cand_cov, top_pos, axis=-1), 0)

    # Winner coordinates come from one small [K-winners → xyz] gather AFTER
    # selection (262K rows at whole-scene scale) — selecting coords from the
    # packed candidate rows via per-axis take_along_axis costs ~14 ms/layer
    # in XLA's lowering (profiled), 20× the gather itself.
    node_xyz = xyz[neighbor_idx]                              # [M, K, 3]
    node_xyz = jnp.where(neighbor_mask[..., None], node_xyz, 0.0)

    center_xyz = center_positions(
        coord_csum, seg_pos, occupancy, center_vids, center_valid,
        resolution, center_mode, origin, vsize)
    out = (neighbor_idx, neighbor_mask, node_xyz, node_coverage, center_xyz)
    if return_candidates:
        out = out + (jnp.where(cand_valid, cand_idx, 0), cand_valid)
    return out


def center_positions(coord_csum, seg_pos, occupancy, center_vids,
                     center_valid, resolution: int, mode: str, origin, vsize):
    """Group-center positions: stored-point barycenter or geometric voxel
    center (paper §3.1 ambiguity → config flag, SURVEY §2.1 F-02)."""
    V = resolution ** 3
    safe_vid = jnp.where(center_valid, center_vids, V)
    if mode == "barycenter":
        # barycenter = voxel center + mean voxel-center residual of the
        # voxel's stored points, read as a cumsum difference over its
        # first `occupancy` voxel-sorted rows (voxelize.VoxelTable) —
        # three [M]-row gathers instead of a grid-wide scatter-add.
        svc = jnp.minimum(safe_vid, V - 1)
        cnt = jnp.where(center_valid, occupancy[svc], 0)
        pos = jnp.where(center_valid, seg_pos[safe_vid], 0)
        # inclusive cumsum: sum over rows [pos, pos+cnt) = csum[pos+cnt-1]
        # − csum[pos-1]; the pos==0 / cnt==0 edge rows are masked by
        # center_valid (cnt ≥ 1 for any valid center)
        hi_ = coord_csum[jnp.maximum(pos + cnt - 1, 0)]
        lo_ = jnp.where((pos > 0)[:, None],
                        coord_csum[jnp.maximum(pos - 1, 0)], 0.0)
        s_res = hi_ - lo_                                     # [M, 3]
        cx, cy, cz = vid_to_coords(svc, resolution)
        vcenter = (jnp.stack([cx, cy, cz], -1).astype(origin.dtype) + 0.5) \
            * vsize + origin
        bary = vcenter + s_res / jnp.maximum(cnt, 1)[:, None].astype(
            coord_csum.dtype)
        return jnp.where(center_valid[:, None], bary, 0.0)
    elif mode == "voxel_center":
        cx, cy, cz = vid_to_coords(jnp.minimum(center_vids, V - 1), resolution)
        coords = jnp.stack([cx, cy, cz], -1).astype(origin.dtype) + 0.5
        c = origin + coords * vsize
        return jnp.where(center_valid[:, None], c, 0.0)
    raise ValueError(f"unknown center_mode: {mode}")


def gather_nodes(table: VoxelTable, xyz: jax.Array, center_vids: jax.Array,
                 center_valid: jax.Array, K: int, context: int,
                 key: jax.Array, center_mode: str = "barycenter",
                 approx: bool = False, return_candidates: bool = False,
                 approx_topk: bool = False,
                 z_window: bool | None = None,
                 coord_payload: bool = False) -> GroupedNodes:
    """Batched F-04 gather; centers from F-02/F-03; xyz = level points.

    return_candidates=True additionally emits the full [M, P*nv] context
    point indices/validity (the paper's grid-context pooling input, F-07).
    approx_topk=True (packed path only) selects nodes with approx_max_k
    instead of a full row sort. z_window overrides the context-run lowering
    choice (None = auto; see run_gather) — both lowerings are value-exact."""
    B = table.occupancy.shape[0]
    keys = jax.random.split(key, B)
    # see run_gather: layout economics flip with vmap
    use_z_window = (B > 1) if z_window is None else z_window
    outs = jax.vmap(
        lambda s, kt, ktp, st, cs, sp, oc, c, x, cv, va, k, o, vs:
        _gather_one(
            s, kt, ktp, st, cs, sp, oc, c, x, cv, va, k, table.resolution, K,
            context, center_mode, o, vs, approx, return_candidates,
            approx_topk, use_z_window, coord_payload))(
        table.slots, table.key_table, table.key_table_pad,
        table.sel_table_pad, table.coord_csum,
        table.seg_pos, table.occupancy, table.coverage, xyz, center_vids,
        center_valid, keys, table.origin, table.vsize)
    nidx, nmask, nxyz, ncov, cxyz = outs[:5]
    cand_idx, cand_valid = (outs[5], outs[6]) if return_candidates else (None, None)
    return GroupedNodes(neighbor_idx=nidx, neighbor_mask=nmask,
                        node_xyz=nxyz, node_coverage=ncov, center_xyz=cxyz,
                        center_valid=center_valid, center_vids=center_vids,
                        cand_idx=cand_idx, cand_valid=cand_valid)

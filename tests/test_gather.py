"""F-04 node gather invariants vs the NumPy oracle (SURVEY §4.2 #1, #2)."""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.configs.base import GridLayerSpec
from gridgcn_tpu.ops import cagq
from gridgcn_tpu.ops.voxelize import slots_from_keys
from tests.oracle import oracle_np


def _slots(table, n_points):
    """Slot table for oracles: direct, or recovered from the packed keys
    (the default CAGQ path builds keys instead of slots)."""
    if table.slots is not None:
        return np.asarray(table.slots)
    return np.asarray(slots_from_keys(table.key_table, n_points))

SPEC = GridLayerSpec(resolution=8, nv=4, n_centers=48, k_neighbors=16,
                     context=3, sampler="rvs")


def _run(key, B=2, N=400, spec=SPEC, pad=0):
    xyz = jax.random.uniform(key, (B, N, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((B, N), bool)
    if pad:
        mask = mask.at[:, N - pad:].set(False)
    return cagq(xyz, mask, spec, key), xyz, mask


def test_nodes_within_context(rng_key):
    out, xyz, mask = _run(rng_key)
    g = out.groups
    vid = np.asarray(out.table.point_vid)
    nidx = np.asarray(g.neighbor_idx)
    nmask = np.asarray(g.neighbor_mask)
    cvid = np.asarray(g.center_vids)
    r = (SPEC.context - 1) // 2
    for b in range(xyz.shape[0]):
        for m in range(SPEC.n_centers):
            for k in range(SPEC.k_neighbors):
                if not nmask[b, m, k]:
                    continue
                node_vid = vid[b, nidx[b, m, k]]
                d = oracle_np.chebyshev_voxel_dist(
                    node_vid, cvid[b, m], SPEC.resolution)
                assert d <= r


def test_node_coverage_is_voxel_count(rng_key):
    out, xyz, mask = _run(rng_key)
    g = out.groups
    vid = np.asarray(out.table.point_vid)
    # packed cagq builds carry no raw-coverage grid (with_coverage=False);
    # reconstruct it from the per-point voxel ids with the NumPy oracle
    cov = np.stack([oracle_np.coverage_counts(v, out.table.resolution)
                    for v in vid])
    nidx = np.asarray(g.neighbor_idx)
    nmask = np.asarray(g.neighbor_mask)
    ncov = np.asarray(g.node_coverage)
    for b in range(xyz.shape[0]):
        got = ncov[b][nmask[b]]
        expect = cov[b][vid[b][nidx[b][nmask[b]]]]
        np.testing.assert_array_equal(got, expect)


def test_neighbor_count_saturates(rng_key):
    """A center gets min(K, #candidates-in-context) nodes — never fewer."""
    out, xyz, mask = _run(rng_key)
    g = out.groups
    table = out.table
    slots = _slots(table, xyz.shape[1])
    nmask = np.asarray(g.neighbor_mask)
    cvid = np.asarray(g.center_vids)
    cvalid = np.asarray(g.center_valid)
    r = (SPEC.context - 1) // 2
    res = SPEC.resolution
    for b in range(xyz.shape[0]):
        for m in range(SPEC.n_centers):
            if not cvalid[b, m]:
                assert nmask[b, m].sum() == 0
                continue
            x, y, z = oracle_np.vid_coords(np.array(cvid[b, m]), res)
            n_cand = 0
            for dx in range(-r, r + 1):
                for dy in range(-r, r + 1):
                    for dz in range(-r, r + 1):
                        nx, ny, nz = x + dx, y + dy, z + dz
                        if 0 <= nx < res and 0 <= ny < res and 0 <= nz < res:
                            v = ((nx * res) + ny) * res + nz
                            n_cand += (slots[b, v] >= 0).sum()
            assert nmask[b, m].sum() == min(SPEC.k_neighbors, n_cand)


def test_center_barycenter(rng_key):
    out, xyz, mask = _run(rng_key)
    g = out.groups
    table = out.table
    slots = _slots(table, xyz.shape[1])
    xyz_np = np.asarray(xyz)
    cxyz = np.asarray(g.center_xyz)
    cvid = np.asarray(g.center_vids)
    cvalid = np.asarray(g.center_valid)
    for b in range(2):
        for m in range(SPEC.n_centers):
            if not cvalid[b, m]:
                continue
            stored = slots[b, cvid[b, m]]
            stored = stored[stored >= 0]
            assert len(stored) > 0
            np.testing.assert_allclose(
                cxyz[b, m], xyz_np[b, stored].mean(axis=0), rtol=1e-4,
                atol=1e-5)


def test_padding_invariance(rng_key):
    """Mutating masked-out points must not change any CAGQ output
    (SURVEY §4.2 #2 mask-correctness)."""
    spec = SPEC
    B, N, pad = 2, 400, 60
    xyz = jax.random.uniform(rng_key, (B, N, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((B, N), bool).at[:, N - pad:].set(False)
    out1, _, _ = _run(rng_key, B, N, spec, pad)  # regenerates same xyz/mask

    garbage = xyz.at[:, N - pad:, :].set(123.456)
    out2 = cagq(garbage, mask, spec, rng_key)

    np.testing.assert_array_equal(np.asarray(out1.groups.neighbor_idx),
                                  np.asarray(out2.groups.neighbor_idx))
    np.testing.assert_array_equal(np.asarray(out1.groups.neighbor_mask),
                                  np.asarray(out2.groups.neighbor_mask))
    np.testing.assert_allclose(np.asarray(out1.groups.center_xyz),
                               np.asarray(out2.groups.center_xyz))


def test_packed_key_selection_invariants(rng_key):
    """approx_select packed-key path: nodes valid, within context, coverage
    payload correct (hybrid log codec), deterministic."""
    spec = GridLayerSpec(resolution=8, nv=4, n_centers=48, k_neighbors=16,
                         approx_select=True)
    xyz = jax.random.uniform(rng_key, (2, 400, 3), minval=-1, maxval=1)
    mask = jnp.ones((2, 400), bool)
    out = cagq(xyz, mask, spec, rng_key)
    g = out.groups
    vid = np.asarray(out.table.point_vid)
    cov = np.stack([oracle_np.coverage_counts(v, out.table.resolution)
                    for v in vid])
    nidx = np.asarray(g.neighbor_idx)
    nm = np.asarray(g.neighbor_mask)
    ncov = np.asarray(g.node_coverage)
    cvid = np.asarray(g.center_vids)
    for b in range(2):
        sel = nidx[b][nm[b]]
        node_vids = vid[b][sel]
        d = oracle_np.chebyshev_voxel_dist(
            node_vids, np.repeat(cvid[b][:, None], 16, 1)[nm[b]], 8)
        assert (d <= 1).all()
        from gridgcn_tpu.ops.voxelize import (decode_coverage,
                                               encode_coverage)
        expect = np.asarray(decode_coverage(encode_coverage(
            jnp.asarray(cov[b][node_vids]))))
        np.testing.assert_array_equal(ncov[b][nm[b]], expect)
    out2 = cagq(xyz, mask, spec, rng_key)
    np.testing.assert_array_equal(np.asarray(out2.groups.neighbor_idx), nidx)


def test_index_determinism(rng_key):
    out1, _, _ = _run(rng_key)
    out2, _, _ = _run(rng_key)
    np.testing.assert_array_equal(np.asarray(out1.groups.neighbor_idx),
                                  np.asarray(out2.groups.neighbor_idx))


def test_approx_topk_padding_invariance(rng_key):
    """approx_max_k node selection: masked-out points still never leak."""
    spec = GridLayerSpec(resolution=8, nv=4, n_centers=48, k_neighbors=16,
                         context=3, sampler="rvs", approx_topk=True)
    B, N, pad = 2, 400, 60
    xyz = jax.random.uniform(rng_key, (B, N, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((B, N), bool).at[:, N - pad:].set(False)
    out1 = cagq(xyz, mask, spec, jax.random.PRNGKey(5))
    garbage = xyz.at[:, N - pad:, :].set(123.456)
    out2 = cagq(garbage, mask, spec, jax.random.PRNGKey(5))
    g1, g2 = out1.groups, out2.groups
    np.testing.assert_array_equal(np.asarray(g1.neighbor_idx),
                                  np.asarray(g2.neighbor_idx))
    np.testing.assert_array_equal(np.asarray(g1.neighbor_mask),
                                  np.asarray(g2.neighbor_mask))
    np.testing.assert_allclose(np.asarray(g1.node_xyz),
                               np.asarray(g2.node_xyz))
    # every valid center found nodes (pool ≥ K here)
    assert bool(g1.neighbor_mask[np.asarray(g1.center_valid)].any())


def test_z_window_path_matches_slice_gather_path(rng_key):
    """Both context-run lowerings (z-windowed table vs 3-row-run
    slice-gather, ops/gather.run_gather) must be value-exact on identical
    inputs — the batched path auto-selects the window, so a drift would be
    a silent train/eval divergence. Covers exact, packed, and approx_topk
    selection."""
    from gridgcn_tpu.ops.gather import gather_nodes
    from gridgcn_tpu.ops.sampling import sample_centers_rvs
    from gridgcn_tpu.ops.voxelize import build_voxel_table

    for approx, approx_topk in [(False, False), (True, False), (True, True)]:
        spec = GridLayerSpec(resolution=8, nv=4, n_centers=48,
                             k_neighbors=16, context=3, sampler="rvs",
                             approx_topk=approx_topk)
        B, N = 3, 400
        xyz = jax.random.uniform(rng_key, (B, N, 3), minval=-1.0, maxval=1.0)
        mask = jnp.ones((B, N), bool).at[:, N - 25:].set(False)
        table = build_voxel_table(xyz, mask, spec.resolution, spec.nv,
                                  key=jax.random.PRNGKey(7),
                                  with_keys=approx)
        cvid, cvalid = sample_centers_rvs(table, spec.n_centers,
                                          jax.random.PRNGKey(3))
        kw = dict(K=spec.k_neighbors, context=spec.context,
                  key=jax.random.PRNGKey(11), approx=approx,
                  approx_topk=approx_topk)
        a = gather_nodes(table, xyz, cvid, cvalid, z_window=True, **kw)
        b = gather_nodes(table, xyz, cvid, cvalid, z_window=False, **kw)
        for fa, fb in [(a.neighbor_idx, b.neighbor_idx),
                       (a.neighbor_mask, b.neighbor_mask),
                       (a.node_coverage, b.node_coverage),
                       (a.node_xyz, b.node_xyz)]:
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_coord_match_is_bit_exact(rng_key):
    """coord_match (combined [key|x|y|z] table + one-hot key-match einsum)
    must reproduce the key-table path EXACTLY: same selection, and node_xyz
    bit-identical to the gathered coordinates (bf16 triple-split is
    lossless for f32)."""
    base = dict(resolution=8, nv=4, n_centers=48, k_neighbors=16,
                approx_select=True)
    for approx_topk in (False, True):
        for z_window in (False, True):
            sa = GridLayerSpec(**base, approx_topk=approx_topk)
            sb = GridLayerSpec(**base, approx_topk=approx_topk,
                               coord_match=True)
            xyz = jax.random.uniform(rng_key, (2, 400, 3), minval=-1,
                                     maxval=1)
            mask = jnp.ones((2, 400), bool).at[:, 380:].set(False)
            from gridgcn_tpu.ops.voxelize import build_voxel_table
            from gridgcn_tpu.ops.sampling import sample_centers_rvs
            from gridgcn_tpu.ops.gather import gather_nodes

            kw = dict(key_pad=(1, 3), with_slots=False, with_keys=True)
            ta = build_voxel_table(xyz, mask, 8, 4, jax.random.PRNGKey(7),
                                   **kw)
            tb = build_voxel_table(xyz, mask, 8, 4, jax.random.PRNGKey(7),
                                   sel_coords=True, **kw)
            cvid, cvalid = sample_centers_rvs(ta, 48, jax.random.PRNGKey(3))
            gkw = dict(K=16, context=3, key=jax.random.PRNGKey(11),
                       approx=True, approx_topk=approx_topk,
                       z_window=z_window)
            ga = gather_nodes(ta, xyz, cvid, cvalid, **gkw)
            gb = gather_nodes(tb, xyz, cvid, cvalid, **gkw)
            np.testing.assert_array_equal(np.asarray(ga.neighbor_idx),
                                          np.asarray(gb.neighbor_idx))
            np.testing.assert_array_equal(np.asarray(ga.neighbor_mask),
                                          np.asarray(gb.neighbor_mask))
            np.testing.assert_array_equal(np.asarray(ga.node_coverage),
                                          np.asarray(gb.node_coverage))
            np.testing.assert_array_equal(np.asarray(ga.node_xyz),
                                          np.asarray(gb.node_xyz))
            np.testing.assert_allclose(np.asarray(ga.center_xyz),
                                       np.asarray(gb.center_xyz))


def test_coord_payload_is_bit_exact(rng_key):
    """coord_payload (winner coords ride the selection sort as payload
    operands) must reproduce the key-table top_k path EXACTLY: selection
    keys are unique (they embed the point index), so the 4-operand
    descending sort yields the same winners, and the payload coords are
    bitcasts of the same xyz rows the winner gather would fetch."""
    import dataclasses

    from gridgcn_tpu.ops.cagq import cagq

    base = GridLayerSpec(resolution=8, nv=4, n_centers=48, k_neighbors=16,
                         sampler="rvs")
    for B in (1, 2):       # B=1 slice-gather runs, B=2 z-window runs
        xyz = jax.random.uniform(rng_key, (B, 400, 3), minval=-1, maxval=1)
        mask = jnp.ones((B, 400), bool).at[:, 380:].set(False)
        key = jax.random.PRNGKey(5)
        ga = cagq(xyz, mask, base, key).groups
        gb = cagq(xyz, mask,
                  dataclasses.replace(base, coord_payload=True), key).groups
        for f in ("neighbor_idx", "neighbor_mask", "node_xyz",
                  "node_coverage", "center_xyz", "center_valid"):
            np.testing.assert_array_equal(np.asarray(getattr(ga, f)),
                                          np.asarray(getattr(gb, f)),
                                          err_msg=f)

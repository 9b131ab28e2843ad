"""F-01 voxel-table build vs the NumPy oracle (SURVEY §4.2 #1, #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridgcn_tpu.ops import build_voxel_table, capacity_stats
from tests.oracle import oracle_np


def _random_cloud(key, B=2, N=300, pad=40):
    xyz = jax.random.uniform(key, (B, N, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((B, N), bool)
    mask = mask.at[:, N - pad:].set(False)
    return xyz, mask


@pytest.mark.parametrize("resolution,nv", [(4, 4), (8, 8), (8, 2)])
def test_coverage_matches_numpy(rng_key, resolution, nv):
    xyz, mask = _random_cloud(rng_key)
    table = build_voxel_table(xyz, mask, resolution, nv, rng_key)
    xyz_np, mask_np = np.asarray(xyz), np.asarray(mask)
    for b in range(xyz.shape[0]):
        origin, vsize = oracle_np.grid_bounds(xyz_np[b], mask_np[b], resolution)
        vid = oracle_np.voxel_ids(xyz_np[b], mask_np[b], origin, vsize,
                                  resolution)
        cov = oracle_np.coverage_counts(vid, resolution)
        np.testing.assert_array_equal(np.asarray(table.coverage[b]), cov)
        np.testing.assert_array_equal(np.asarray(table.point_vid[b]), vid)
        np.testing.assert_array_equal(
            np.asarray(table.occupancy[b]), np.minimum(cov, nv))


def test_slots_consistent(rng_key):
    resolution, nv = 8, 4
    xyz, mask = _random_cloud(rng_key)
    table = build_voxel_table(xyz, mask, resolution, nv, rng_key)
    slots = np.asarray(table.slots)
    vid = np.asarray(table.point_vid)
    occ = np.asarray(table.occupancy)
    mask_np = np.asarray(mask)
    for b in range(xyz.shape[0]):
        for v in range(table.num_voxels):
            stored = slots[b, v][slots[b, v] >= 0]
            # stored count equals occupancy
            assert len(stored) == occ[b, v]
            # no duplicates
            assert len(set(stored.tolist())) == len(stored)
            # each stored point is valid and belongs to this voxel
            for p in stored:
                assert mask_np[b, p]
                assert vid[b, p] == v


def test_no_drops_when_capacity_sufficient(rng_key):
    xyz, mask = _random_cloud(rng_key, N=200, pad=0)
    table = build_voxel_table(xyz, mask, 4, 200, rng_key)
    stats = capacity_stats(table)
    np.testing.assert_array_equal(np.asarray(stats["dropped_points"]), 0)


def test_determinism_and_key_sensitivity(rng_key):
    xyz, mask = _random_cloud(rng_key)
    t1 = build_voxel_table(xyz, mask, 8, 2, rng_key)
    t2 = build_voxel_table(xyz, mask, 8, 2, rng_key)
    np.testing.assert_array_equal(np.asarray(t1.slots), np.asarray(t2.slots))
    t3 = build_voxel_table(xyz, mask, 8, 2, jax.random.PRNGKey(7))
    # nv=2 with ~260 pts in 512 voxels: some voxels overflow, so a different
    # shuffle retains different subsets
    assert not np.array_equal(np.asarray(t1.slots), np.asarray(t3.slots))
    # but coverage is shuffle-invariant
    np.testing.assert_array_equal(
        np.asarray(t1.coverage), np.asarray(t3.coverage))


def test_masked_points_never_stored(rng_key):
    xyz, mask = _random_cloud(rng_key, N=100, pad=50)
    # poison the padded points with coordinates inside the cloud
    xyz = xyz.at[:, 50:, :].set(0.0)
    table = build_voxel_table(xyz, mask, 4, 100, rng_key)
    slots = np.asarray(table.slots)
    stored = slots[slots >= 0]
    assert stored.max(initial=-1) < 50
    assert int(np.asarray(table.coverage).sum()) == 2 * 50


def test_coverage_codec_properties():
    """Hybrid 6-bit coverage codec (VERDICT r1 weak #5): exact below 32,
    monotone non-decreasing, <=10% relative error through whole-scene
    densities, and strictly more range than the old min(count, 63) clamp."""
    import jax.numpy as jnp

    from gridgcn_tpu.ops.voxelize import decode_coverage, encode_coverage

    counts = jnp.asarray(list(range(0, 256)) + [300, 500, 1000, 3000, 6889])
    codes = encode_coverage(counts)
    dec = decode_coverage(codes)
    c = np.asarray(counts)
    d = np.asarray(dec)
    assert (np.asarray(codes) <= 63).all() and (np.asarray(codes) >= 0).all()
    np.testing.assert_array_equal(d[c < 32], c[c < 32])      # exact
    rel = np.abs(d[c >= 32] - c[c >= 32]) / c[c >= 32]
    assert rel.max() <= 0.10, rel.max()
    assert (np.diff(d) >= 0).all()                            # monotone
    # old clamp saturated at 63; codec distinguishes dense voxels
    assert d[np.nonzero(c == 1000)[0][0]] > 900


def test_coverage_codec_gca_impact_at_scene_density():
    """The codec's quantization error is immaterial to GCA: attention
    outputs with decoded coverage match exact-coverage outputs to ~1e-2
    at whole-scene voxel densities (hundreds of raw points per voxel)."""
    import jax
    import jax.numpy as jnp

    from gridgcn_tpu.configs.base import GridLayerSpec
    from gridgcn_tpu.models.gca import GCA
    from gridgcn_tpu.ops.voxelize import decode_coverage, encode_coverage

    spec = GridLayerSpec(mlp=(32, 32), use_coverage=True,
                        use_context_pool=False, att_hidden=16)
    gca = GCA(spec)
    B, M, K, C = 1, 16, 16, 8
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    node_feat = jax.random.normal(k1, (B, M, K, C))
    delta_p = jax.random.normal(k2, (B, M, K, 3)) * 0.1
    mask = jnp.ones((B, M, K), bool)
    # skewed whole-scene-like coverage: a few voxels with hundreds of points
    cov_exact = jnp.asarray(
        np.random.default_rng(0).choice(
            [1, 2, 3, 8, 40, 120, 400, 900], size=(B, M, K)), jnp.int32)
    cov_dec = decode_coverage(encode_coverage(cov_exact))

    variables = gca.init(k3, node_feat, delta_p, mask, cov_exact)
    out_exact = gca.apply(variables, node_feat, delta_p, mask, cov_exact)
    out_dec = gca.apply(variables, node_feat, delta_p, mask, cov_dec)
    err = float(jnp.max(jnp.abs(out_exact - out_dec)))
    scale = float(jnp.max(jnp.abs(out_exact)))
    assert err <= 0.02 * max(scale, 1.0), (err, scale)


def test_selection_key_packing_rejects_oversize_clouds():
    """The [valid|rand|coverage|index] key layout runs out of bits above
    2^22 points; the build must refuse at trace time rather than let
    dropped points alias valid keys (shape-only trace via eval_shape)."""
    import pytest

    from gridgcn_tpu.ops.voxelize import build_voxel_table

    N = 1 << 23
    xyz = jax.ShapeDtypeStruct((1, N, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((1, N), jnp.bool_)
    with pytest.raises(ValueError, match="selection-key"):
        jax.eval_shape(
            lambda x, m: build_voxel_table(x, m, 16, 8,
                                           jax.random.PRNGKey(0),
                                           with_keys=True),
            xyz, mask)

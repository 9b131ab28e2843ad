"""F-02 RVS / F-03 CAS properties (SURVEY §4.2 #2)."""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.ops import build_voxel_table, sample_centers_cas, sample_centers_rvs
from tests.oracle import oracle_np


def _table(key, B=2, N=400, resolution=8, nv=4):
    xyz = jax.random.uniform(key, (B, N, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((B, N), bool)
    return build_voxel_table(xyz, mask, resolution, nv, key), xyz, mask


def test_rvs_selects_occupied_distinct(rng_key):
    table, _, _ = _table(rng_key)
    vids, valid = sample_centers_rvs(table, 64, rng_key)
    vids, valid = np.asarray(vids), np.asarray(valid)
    cov = np.asarray(table.coverage)
    for b in range(vids.shape[0]):
        sel = vids[b][valid[b]]
        assert len(set(sel.tolist())) == len(sel)          # distinct
        assert (cov[b][sel] > 0).all()                      # occupied
        # enough occupied voxels for 400 pts in 512 voxels → all valid
        assert valid[b].all()


def test_rvs_handles_fewer_occupied_than_m(rng_key):
    # 10 valid points → ≤10 occupied voxels, ask for 32 centers
    xyz = jax.random.uniform(rng_key, (1, 64, 3))
    mask = jnp.zeros((1, 64), bool).at[:, :10].set(True)
    table = build_voxel_table(xyz, mask, 8, 4, rng_key)
    vids, valid = sample_centers_rvs(table, 32, rng_key)
    n_occ = int((np.asarray(table.coverage)[0] > 0).sum())
    assert int(np.asarray(valid).sum()) == n_occ
    sel = np.asarray(vids)[0][np.asarray(valid)[0]]
    assert (np.asarray(table.coverage)[0][sel] > 0).all()


def test_cas_selects_occupied_distinct(rng_key):
    table, _, _ = _table(rng_key)
    vids, valid = sample_centers_cas(table, 48, rng_key, cas_iters=2)
    vids, valid = np.asarray(vids), np.asarray(valid)
    cov = np.asarray(table.coverage)
    for b in range(vids.shape[0]):
        sel = vids[b][valid[b]]
        assert len(set(sel.tolist())) == len(sel)
        assert (cov[b][sel] > 0).all()


def test_cas_coverage_geq_rvs(rng_key):
    """Paper §3.1 Fig. 2: CAS achieves better space coverage than RVS."""
    resolution, context, M = 8, 3, 24
    cas_cov, rvs_cov = [], []
    for t in range(6):
        key = jax.random.PRNGKey(t)
        table, _, _ = _table(key, B=1, N=500, resolution=resolution)
        rv, rvalid = sample_centers_rvs(table, M, key)
        cv, cvalid = sample_centers_cas(table, M, key, context=context,
                                        cas_iters=4)
        rvs_cov.append(oracle_np.covered_voxels(
            np.asarray(rv)[0], np.asarray(rvalid)[0], resolution, context))
        cas_cov.append(oracle_np.covered_voxels(
            np.asarray(cv)[0], np.asarray(cvalid)[0], resolution, context))
    assert np.mean(cas_cov) >= np.mean(rvs_cov)


def test_sampling_determinism(rng_key):
    table, _, _ = _table(rng_key)
    v1, _ = sample_centers_rvs(table, 32, rng_key)
    v2, _ = sample_centers_rvs(table, 32, rng_key)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    c1, _ = sample_centers_cas(table, 32, rng_key)
    c2, _ = sample_centers_cas(table, 32, rng_key)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

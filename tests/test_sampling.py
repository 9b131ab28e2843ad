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
    # tightened from >= (VERDICT r1 next-round #10): the docs/design.md §9
    # study measured batched-Jacobi(4) at 96-102% of sequential
    # Gauss-Seidel's coverage gain (+13-28% over RVS at preset scales);
    # demand a real margin here, not mere non-regression
    assert np.mean(cas_cov) >= 1.03 * np.mean(rvs_cov), (
        np.mean(cas_cov), np.mean(rvs_cov))


def test_cas_jacobi_recovers_gauss_seidel_gap(rng_key):
    """docs/design.md §9: batched-Jacobi CAS (the TPU-shaped sampler) must
    recover >=85% of the sequential Gauss-Seidel oracle's coverage gain
    over RVS. A GS pass issues |unselected| challenges while a Jacobi round
    issues M, so rounds needed scale with occ/M: at preset scales (M=1-2k,
    occ/M≈2) 2-4 rounds suffice (measured 96-103%, scripts/cas_study.py);
    at this test's occ/M≈13 it takes 16."""
    resolution, context, M = 12, 3, 96
    rec = []
    for t in range(3):
        key = jax.random.PRNGKey(40 + t)
        table, _, _ = _table(key, B=1, N=1500, resolution=resolution)
        occ = np.nonzero(np.asarray(table.coverage)[0] > 0)[0]
        rv, rvalid = sample_centers_rvs(table, M, key)
        rvs = oracle_np.covered_voxels(
            np.asarray(rv)[0], np.asarray(rvalid)[0], resolution, context)
        cv, cvalid = sample_centers_cas(table, M, key, context=context,
                                        cas_iters=16)
        jac = oracle_np.covered_voxels(
            np.asarray(cv)[0], np.asarray(cvalid)[0], resolution, context)
        sel = oracle_np.cas_gauss_seidel(
            occ, M, resolution, context, np.random.default_rng(t), iters=2)
        gs = oracle_np.covered_voxels(
            sel, np.ones(len(sel), bool), resolution, context)
        if gs > rvs:
            rec.append((jac - rvs) / (gs - rvs))
    assert rec and np.mean(rec) >= 0.85, rec


def test_sampling_determinism(rng_key):
    table, _, _ = _table(rng_key)
    v1, _ = sample_centers_rvs(table, 32, rng_key)
    v2, _ = sample_centers_rvs(table, 32, rng_key)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    c1, _ = sample_centers_cas(table, 32, rng_key)
    c2, _ = sample_centers_cas(table, 32, rng_key)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_rvs_approx_small_m_falls_back_to_exact():
    """Threshold sampling's M − 3√M margin hits zero at M ≤ 9, which would
    select NO centers whenever n_occ > M; small M must redirect to the
    exact Gumbel path and still return M valid centers."""
    from gridgcn_tpu.ops.sampling import sample_centers_cas, sample_centers_rvs
    from gridgcn_tpu.ops.voxelize import build_voxel_table

    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (1, 512, 3))
    mask = jnp.ones((1, 512), bool)
    table = build_voxel_table(xyz, mask, 8, 4, key)   # n_occ ≫ 8
    for M in (4, 8):
        vids, valid = sample_centers_rvs(table, M, key, approx=True)
        assert int(valid.sum()) == M, f"RVS approx M={M} lost centers"
        vids, valid = sample_centers_cas(table, M, key, cas_iters=1,
                                         approx=True)
        assert int(valid.sum()) == M, f"CAS approx M={M} lost centers"

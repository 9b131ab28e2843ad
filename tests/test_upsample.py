"""F-05 grid 3-NN upsample query vs brute force (SURVEY §4.2 #1)."""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.ops import grid_three_nn, three_nn_interpolate
from tests.oracle import oracle_np


def test_matches_brute_force_on_dense_support(rng_key):
    """With a coarse grid (few voxels, big context reach) every true NN is in
    the context, so grid 3-NN must equal exact 3-NN."""
    B, Nq, Ns = 2, 128, 96
    q = jax.random.uniform(rng_key, (B, Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(5), (B, Ns, 3))
    qm = jnp.ones((B, Nq), bool)
    sm = jnp.ones((B, Ns), bool)
    # resolution 2 + context 3 → every voxel's context spans the whole grid
    idx, w, found = grid_three_nn(q, qm, s, sm, resolution=2, nv=Ns,
                                  key=rng_key, k=3, context=3)
    assert bool(found.all())
    idx, w = np.asarray(idx), np.asarray(w)
    for b in range(B):
        bf_idx, bf_d2 = oracle_np.brute_force_knn(
            np.asarray(q[b]), np.asarray(s[b]), np.asarray(sm[b]), 3)
        np.testing.assert_array_equal(np.sort(idx[b], axis=1),
                                      np.sort(bf_idx, axis=1))
        # weights: inverse distance, normalized
        wi = 1.0 / (bf_d2 + 1e-8)
        wi = wi / wi.sum(axis=1, keepdims=True)
        got = np.take_along_axis(
            w[b], np.argsort(idx[b], axis=1), axis=1)
        want = np.take_along_axis(
            wi, np.argsort(bf_idx, axis=1), axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_dense_knn_matches_brute_force(rng_key):
    """MXU brute-force path is exact k-NN."""
    from gridgcn_tpu.ops import dense_three_nn
    B, Nq, Ns = 2, 200, 150
    q = jax.random.uniform(rng_key, (B, Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(11), (B, Ns, 3))
    qm = jnp.ones((B, Nq), bool).at[:, 190:].set(False)
    sm = jnp.ones((B, Ns), bool).at[:, 140:].set(False)
    idx, w, found = dense_three_nn(q, qm, s, sm, k=3, block=64)
    idx, w, found = np.asarray(idx), np.asarray(w), np.asarray(found)
    assert found[:, :190].all() and not found[:, 190:].any()
    for b in range(B):
        bf_idx, bf_d2 = oracle_np.brute_force_knn(
            np.asarray(q[b]), np.asarray(s[b]), np.asarray(sm[b]), 3)
        np.testing.assert_array_equal(np.sort(idx[b, :190], axis=1),
                                      np.sort(bf_idx[:190], axis=1))
    # weights normalized on found queries
    np.testing.assert_allclose(w[:, :190].sum(-1), 1.0, atol=1e-5)


def test_dense_knn_approx_mode(rng_key):
    """approx_min_k path: valid neighbors, normalized weights, (near-)exact
    on CPU where the fallback is exact."""
    from gridgcn_tpu.ops import dense_three_nn
    B, Nq, Ns = 1, 150, 100
    q = jax.random.uniform(rng_key, (B, Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(12), (B, Ns, 3))
    qm = jnp.ones((B, Nq), bool)
    sm = jnp.ones((B, Ns), bool)
    idx_a, w_a, f_a = dense_three_nn(q, qm, s, sm, k=3, approx=True)
    idx_e, w_e, f_e = dense_three_nn(q, qm, s, sm, k=3)
    assert np.asarray(f_a).all()
    np.testing.assert_allclose(np.asarray(w_a).sum(-1), 1.0, atol=1e-5)
    # on the CPU backend approx_min_k is exact → same neighbor sets
    np.testing.assert_array_equal(np.sort(np.asarray(idx_a), -1),
                                  np.sort(np.asarray(idx_e), -1))


def test_weights_sum_to_one_or_zero(rng_key):
    B, Nq, Ns = 2, 200, 32
    q = jax.random.uniform(rng_key, (B, Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(3), (B, Ns, 3)) * 0.3  # corner
    qm = jnp.ones((B, Nq), bool)
    sm = jnp.ones((B, Ns), bool)
    idx, w, found = grid_three_nn(q, qm, s, sm, resolution=8, nv=8,
                                  key=rng_key)
    wsum = np.asarray(w.sum(-1))
    found = np.asarray(found)
    np.testing.assert_allclose(wsum[found], 1.0, atol=1e-5)
    np.testing.assert_allclose(wsum[~found], 0.0, atol=1e-7)


def test_interpolation_constant_field(rng_key):
    """Interpolating a constant feature field returns the constant where
    neighbors were found."""
    B, Nq, Ns, C = 1, 64, 48, 7
    q = jax.random.uniform(rng_key, (B, Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(9), (B, Ns, 3))
    idx, w, found = grid_three_nn(q, jnp.ones((B, Nq), bool), s,
                                  jnp.ones((B, Ns), bool), 4, 16, rng_key)
    feat = jnp.full((B, Ns, C), 2.5)
    out = np.asarray(three_nn_interpolate(feat, idx, w))
    found = np.asarray(found)
    np.testing.assert_allclose(out[found], 2.5, rtol=1e-5)


def test_interpolation_combined_gather_is_bit_exact(rng_key):
    """The one-gather [Nq, k]-index-space form of three_nn_interpolate
    (ops.upsample._INTERP_COMBINED — the §11 layout experiment) is
    bit-identical to the default k fused row-gathers."""
    from gridgcn_tpu.ops import upsample

    B, Nq, Ns, C = 2, 200, 80, 19
    feat = jax.random.normal(rng_key, (B, Ns, C))
    idx = jax.random.randint(jax.random.PRNGKey(3), (B, Nq, 3), 0, Ns)
    w = jax.random.uniform(jax.random.PRNGKey(4), (B, Nq, 3))
    split = np.asarray(three_nn_interpolate(feat, idx, w))
    prev = upsample._INTERP_COMBINED
    try:
        upsample._INTERP_COMBINED = True
        combined = np.asarray(three_nn_interpolate(feat, idx, w))
    finally:
        upsample._INTERP_COMBINED = prev
    np.testing.assert_array_equal(split, combined)

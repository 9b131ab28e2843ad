"""Pallas kernels vs oracles (interpret mode on CPU, SURVEY §4.2 #1)."""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.ops.pallas.knn import flash_three_nn
from gridgcn_tpu.ops.upsample import dense_three_nn
from tests.oracle import oracle_np


def test_flash_knn_matches_brute_force(rng_key):
    B, Nq, Ns = 2, 300, 200
    q = jax.random.uniform(rng_key, (B, Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(8), (B, Ns, 3))
    qm = jnp.ones((B, Nq), bool).at[:, 280:].set(False)
    sm = jnp.ones((B, Ns), bool).at[:, 180:].set(False)

    idx, w, found = flash_three_nn(q, qm, s, sm, k=3, interpret=True)
    idx, w, found = np.asarray(idx), np.asarray(w), np.asarray(found)
    assert found[:, :280].all() and not found[:, 280:].any()
    for b in range(B):
        bf_idx, bf_d2 = oracle_np.brute_force_knn(
            np.asarray(q[b]), np.asarray(s[b]), np.asarray(sm[b]), 3)
        np.testing.assert_array_equal(idx[b, :280], bf_idx[:280])


def test_flash_knn_matches_xla_dense_path(rng_key):
    B, Nq, Ns = 1, 500, 700   # support spans >1 block (SB handling)
    q = jax.random.uniform(rng_key, (B, Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(4), (B, Ns, 3))
    qm = jnp.ones((B, Nq), bool)
    sm = jnp.ones((B, Ns), bool)

    i1, w1, f1 = flash_three_nn(q, qm, s, sm, k=3, interpret=True)
    i2, w2, f2 = dense_three_nn(q, qm, s, sm, k=3, block=256)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.sort(np.asarray(i1), -1),
                                  np.sort(np.asarray(i2), -1))
    # w1/w2 use different d² formulations ((q-s)² vs |q|²+|s|²-2q·s), which
    # diverge through the 1/d² weighting at tiny distances
    np.testing.assert_allclose(np.sort(np.asarray(w1), -1),
                               np.sort(np.asarray(w2), -1),
                               rtol=1e-3, atol=1e-3)

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

    idx, w, found = flash_three_nn(q, qm, s, sm, k=3, interpret=True,
                                   variant="exact")
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

    i1, w1, f1 = flash_three_nn(q, qm, s, sm, k=3, interpret=True,
                                variant="exact")
    i2, w2, f2 = dense_three_nn(q, qm, s, sm, k=3, block=256)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.sort(np.asarray(i1), -1),
                                  np.sort(np.asarray(i2), -1))
    # w1/w2 use different d² formulations ((q-s)² vs |q|²+|s|²-2q·s), which
    # diverge through the 1/d² weighting at tiny distances
    np.testing.assert_allclose(np.sort(np.asarray(w1), -1),
                               np.sort(np.asarray(w2), -1),
                               rtol=1e-3, atol=1e-3)


def test_flash_knn_mxu_near_exact(rng_key):
    """MXU lane-fold variant: top-1 exact (mod near-ties), recall ≥ 0.97,
    d² within split-bf16 error of the exact kernel on matching neighbors."""
    from gridgcn_tpu.ops.pallas.knn import flash_knn, flash_knn_mxu

    Nq, Ns = 1024, 700
    q = jax.random.uniform(rng_key, (Nq, 3), minval=-4.0, maxval=9.0)
    s = jax.random.uniform(jax.random.PRNGKey(4), (Ns, 3),
                           minval=-4.0, maxval=9.0)
    qm = jnp.ones((Nq,), bool)
    sm = jnp.ones((Ns,), bool).at[Ns - 7:].set(False)

    d2e, ie, ve = flash_knn(q, qm, s, sm, k=3, interpret=True)
    d2m, im, vm = flash_knn_mxu(q, qm, s, sm, k=3, interpret=True)
    d2e, ie = np.asarray(d2e), np.asarray(ie)
    d2m, im = np.asarray(d2m), np.asarray(im)

    np.testing.assert_array_equal(np.asarray(ve), np.asarray(vm))
    recall = np.mean([len(set(ie[i]) & set(im[i])) / 3 for i in range(Nq)])
    assert recall >= 0.97, recall
    assert (ie[:, 0] == im[:, 0]).mean() >= 0.99   # near-ties may swap
    match = ie == im
    # scene coords span ~13 → split-bf16 absolute d² error ~2⁻¹⁶·|q||s|
    assert np.abs(d2m - d2e)[match].max() < 2e-2


def test_flash_knn_mxu_split_survives_lowering(rng_key):
    """The split-bf16 hi halves must be formed with lax.reduce_precision:
    an astype(bf16).astype(f32) round-trip is folded away by XLA:TPU's
    algebraic simplifier (the value feeds a bf16 dot), which zeroes every
    lo residual — measured d² error jumped 4e-5 → 2.6e-2 on v5e, and top-1
    agreement with the exact kernel fell to 0.63 at whole-scene sizes.
    XLA:CPU does not perform the fold, so interpret-mode numeric tests can't
    catch a regression; guard the lowering instead (4 splits: q, |q|²,
    s, |s|²)."""
    from gridgcn_tpu.ops.pallas.knn import flash_knn_mxu

    q = jax.random.uniform(rng_key, (64, 3))
    m = jnp.ones((64,), bool)
    text = jax.jit(
        lambda a, b, c, d: flash_knn_mxu(a, b, c, d, interpret=True)
    ).lower(q, m, q, m).as_text()
    assert text.count("reduce_precision") >= 4, \
        "flash_knn_mxu splits must go through lax.reduce_precision"


def test_flash_knn_mxu_masked_supports_never_win(rng_key):
    from gridgcn_tpu.ops.pallas.knn import flash_knn_mxu

    Nq, Ns = 256, 300
    q = jax.random.uniform(rng_key, (Nq, 3))
    s = jax.random.uniform(jax.random.PRNGKey(5), (Ns, 3))
    # only 2 valid supports, both co-located at the origin area
    sm = jnp.zeros((Ns,), bool).at[:2].set(True)
    qm = jnp.ones((Nq,), bool)

    d2, idx, valid = flash_knn_mxu(q, qm, s, sm, k=3, interpret=True)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert valid[:, :2].all() and not valid[:, 2:].any()
    assert (idx[valid] < 2).all()


def test_flash_knn_mxu_support_chunking_minimal_pad(rng_key):
    """Support padding is sized to the data, not rounded up to a full sb
    chunk: at Ns just past a chunk boundary the old `ceil(Ns/sb)*sb`
    padding doubled the MXU pass (measured +1.27 ms/scene on tier-3
    shards, the bulk of the 'fixed' ghost-protocol tax — design.md §13
    addendum 3). Correctness must hold when sb is re-derived (Ns > sb,
    Ns not a multiple), including masked supports."""
    from gridgcn_tpu.ops.pallas.knn import flash_knn, flash_knn_mxu

    Nq, Ns = 512, 700          # sb=512 → n_chunks=2, chunk 384, pad 68 rows
    q = jax.random.uniform(rng_key, (Nq, 3), minval=-4.0, maxval=9.0)
    s = jax.random.uniform(jax.random.PRNGKey(11), (Ns, 3),
                           minval=-4.0, maxval=9.0)
    qm = jnp.ones((Nq,), bool)
    sm = jnp.ones((Ns,), bool).at[Ns - 5:].set(False)

    d2e, ie, ve = flash_knn(q, qm, s, sm, k=3, interpret=True)
    d2m, im, vm = flash_knn_mxu(q, qm, s, sm, k=3, sb=512, interpret=True)
    ie, im = np.asarray(ie), np.asarray(im)

    np.testing.assert_array_equal(np.asarray(ve), np.asarray(vm))
    assert np.all(im < Ns - 5)                 # masked/padded rows never win
    recall = np.mean([len(set(ie[i]) & set(im[i])) / 3 for i in range(Nq)])
    assert recall >= 0.97, recall
    assert (ie[:, 0] == im[:, 0]).mean() >= 0.99

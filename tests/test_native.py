"""Native host runtime (native/batcher.cpp) vs NumPy reference."""

import numpy as np
import pytest

from gridgcn_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.build():
        pytest.skip("native toolchain unavailable")


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 64, 3)).astype(np.float32)
    idx = rng.integers(0, 50, size=17).astype(np.int32)
    out = native.gather_rows(src, idx, threads=4)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_rows_int_labels():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 40, size=(30,)).astype(np.int32)
    idx = rng.integers(0, 30, size=8).astype(np.int32)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_sample_points_subset_semantics():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(4, 100, 3)).astype(np.float32)
    idx = np.array([2, 0, 3], np.int32)
    out = native.sample_points(src, idx, n_out=32, seed=7)
    assert out.shape == (3, 32, 3)
    for i, s in enumerate(idx):
        rows = {tuple(r) for r in np.round(src[s], 5)}
        got = [tuple(r) for r in np.round(out[i], 5)]
        # every sampled point exists in the source cloud, no duplicates
        assert all(g in rows for g in got)
        assert len(set(got)) == len(got)
    # deterministic for a seed
    out2 = native.sample_points(src, idx, n_out=32, seed=7)
    np.testing.assert_array_equal(out, out2)
    out3 = native.sample_points(src, idx, n_out=32, seed=8)
    assert not np.array_equal(out, out3)


def test_sample_points_with_replacement():
    src = np.arange(4 * 5 * 3, dtype=np.float32).reshape(4, 5, 3)
    out = native.sample_points(src, np.array([1], np.int32), n_out=16, seed=0)
    assert out.shape == (1, 16, 3)
    rows = {tuple(r) for r in src[1]}
    assert all(tuple(r) in rows for r in out[0])


def test_label_histogram():
    labels = np.array([0, 1, 1, 3, -1, 2, 3, 3], np.int32)
    out = native.label_histogram(labels, 4)
    np.testing.assert_array_equal(out, [1, 2, 1, 3])

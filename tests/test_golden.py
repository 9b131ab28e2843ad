"""Golden-file regression tests (SURVEY §4.2 #3): op outputs for pinned PRNG
keys must stay bitwise/tolerance stable across refactors. Regenerate with
`python tests/golden/generate.py` after intentional semantic changes."""

import os

import numpy as np
import pytest

from gridgcn_tpu.ops import cagq, grid_three_nn
from tests.oracle import oracle_np
from tests.golden.generate import CAS_SPEC, OUT, SPEC, make_inputs


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(OUT):
        pytest.skip("golden file missing; run tests/golden/generate.py")
    return np.load(OUT)


def test_cagq_matches_golden(golden):
    xyz, mask, key = make_inputs()
    out = cagq(xyz, mask, SPEC, key)
    np.testing.assert_array_equal(np.asarray(out.groups.neighbor_idx),
                                  golden["neighbor_idx"])
    np.testing.assert_array_equal(np.asarray(out.groups.neighbor_mask),
                                  golden["neighbor_mask"])
    np.testing.assert_array_equal(np.asarray(out.groups.node_coverage),
                                  golden["node_coverage"])
    np.testing.assert_array_equal(np.asarray(out.groups.center_vids),
                                  golden["center_vids"])
    # packed builds drop the raw-coverage grid; the golden coverage is
    # still pinned through point_vid (oracle reconstruction) + occupancy
    cov = np.stack([oracle_np.coverage_counts(v, out.table.resolution)
                    for v in np.asarray(out.table.point_vid)])
    np.testing.assert_array_equal(cov, golden["coverage"])
    np.testing.assert_array_equal(
        np.asarray(out.table.occupancy),
        np.minimum(golden["coverage"], out.table.nv))
    np.testing.assert_allclose(np.asarray(out.groups.center_xyz),
                               golden["center_xyz"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.groups.node_xyz),
                               golden["node_xyz"], atol=1e-6)


def test_cas_matches_golden(golden):
    xyz, mask, key = make_inputs()
    out = cagq(xyz, mask, CAS_SPEC, key)
    np.testing.assert_array_equal(np.asarray(out.groups.center_vids),
                                  golden["cas_center_vids"])
    np.testing.assert_array_equal(np.asarray(out.groups.center_valid),
                                  golden["cas_center_valid"])


def test_upsample_matches_golden(golden):
    xyz, mask, key = make_inputs()
    nn_idx, weights, found = grid_three_nn(
        xyz, mask, xyz[:, :64], mask[:, :64], 4, 16, key)
    np.testing.assert_array_equal(np.asarray(nn_idx), golden["up_idx"])
    np.testing.assert_allclose(np.asarray(weights), golden["up_weights"],
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(found), golden["up_found"])

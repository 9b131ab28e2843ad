"""Regenerate golden CAGQ/GCA outputs (SURVEY §4.2 #3).

Run after an *intentional* semantic change:
    python tests/golden/generate.py
The goldens pin op-level outputs for fixed PRNG keys so refactors that should
be no-ops (layout changes, Pallas swaps, fusion work) are provably no-ops.
(If the reference mount is ever populated, regenerate from real reference
activations instead — SURVEY §7 H5.)
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gridgcn_tpu.configs.base import GridLayerSpec  # noqa: E402
from gridgcn_tpu.ops import cagq, grid_three_nn  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden.npz")

SPEC = GridLayerSpec(resolution=8, nv=4, n_centers=32, k_neighbors=16,
                     context=3, sampler="rvs")
CAS_SPEC = GridLayerSpec(resolution=8, nv=4, n_centers=32, k_neighbors=16,
                         context=3, sampler="cas", cas_iters=2)


def make_inputs():
    key = jax.random.PRNGKey(1234)
    xyz = jax.random.uniform(key, (2, 300, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((2, 300), bool).at[:, 280:].set(False)
    return xyz, mask, key


def main():
    xyz, mask, key = make_inputs()
    out = cagq(xyz, mask, SPEC, key)
    cas_out = cagq(xyz, mask, CAS_SPEC, key)
    nn_idx, weights, found = grid_three_nn(
        xyz, mask, xyz[:, :64], mask[:, :64], 4, 16, key)
    np.savez(
        OUT,
        neighbor_idx=np.asarray(out.groups.neighbor_idx),
        neighbor_mask=np.asarray(out.groups.neighbor_mask),
        node_coverage=np.asarray(out.groups.node_coverage),
        node_xyz=np.asarray(out.groups.node_xyz),
        center_xyz=np.asarray(out.groups.center_xyz),
        center_vids=np.asarray(out.groups.center_vids),
        coverage=np.stack(
            [__import__('tests.oracle.oracle_np', fromlist=['x'])
             .coverage_counts(v, out.table.resolution)
             for v in np.asarray(out.table.point_vid)]),
        cas_center_vids=np.asarray(cas_out.groups.center_vids),
        cas_center_valid=np.asarray(cas_out.groups.center_valid),
        up_idx=np.asarray(nn_idx),
        up_weights=np.asarray(weights),
        up_found=np.asarray(found),
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

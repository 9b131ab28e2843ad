"""CAS fidelity study (VERDICT r1 next-round #10): how much of sequential
Gauss-Seidel CAS's coverage gain does the TPU-shaped batched-Jacobi sampler
recover, as a function of `cas_iters`, at the seg presets' grid settings?

Coverage measure = paper Fig. 2: distinct voxels covered by the selected
centers' context³ neighborhoods (tests/oracle/oracle_np.covered_voxels).
Results are recorded in docs/design.md §9 and back the property-test bound
in tests/test_sampling.py.

  JAX_PLATFORMS=cpu python scripts/cas_study.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.data.synthetic import synthetic_scene_surface
from gridgcn_tpu.ops import build_voxel_table, sample_centers_cas, \
    sample_centers_rvs
from tests.oracle import oracle_np


def run_setting(name, n_points, resolution, M, context=3, seeds=(0, 1, 2)):
    rows = []
    cov = {k: [] for k in ("rvs", "j1", "j2", "j4", "j8", "gs1", "gs2")}
    for seed in seeds:
        pts = synthetic_scene_surface(n_points, seed=seed)
        xyz = jnp.asarray(pts)[None]
        mask = jnp.ones((1, n_points), bool)
        table = build_voxel_table(xyz, mask, resolution, 16,
                                  jax.random.PRNGKey(seed))
        occ = np.nonzero(np.asarray(table.coverage)[0] > 0)[0]
        key = jax.random.PRNGKey(100 + seed)

        v, ok = sample_centers_rvs(table, M, key)
        cov["rvs"].append(oracle_np.covered_voxels(
            np.asarray(v)[0], np.asarray(ok)[0], resolution, context))
        for it in (1, 2, 4, 8):
            v, ok = sample_centers_cas(table, M, key, context=context,
                                       cas_iters=it)
            cov[f"j{it}"].append(oracle_np.covered_voxels(
                np.asarray(v)[0], np.asarray(ok)[0], resolution, context))
        rng = np.random.default_rng(seed)
        for it in (1, 2):
            sel = oracle_np.cas_gauss_seidel(occ, M, resolution, context,
                                             rng, iters=it)
            cov[f"gs{it}"].append(oracle_np.covered_voxels(
                sel, np.ones(len(sel), bool), resolution, context))

    m = {k: float(np.mean(v)) for k, v in cov.items()}
    gs = m["gs2"]
    rvs = m["rvs"]
    print(f"\n{name}: N={n_points} res={resolution} M={M} "
          f"occ≈{len(occ)} (mean over {len(seeds)} surface scenes)")
    print(f"{'sampler':>10} {'covered':>9} {'vs RVS':>8} {'GS-gap recovered':>17}")
    for k in ("rvs", "j1", "j2", "j4", "j8", "gs1", "gs2"):
        rec = (m[k] - rvs) / max(gs - rvs, 1e-9)
        print(f"{k:>10} {m[k]:9.0f} {m[k] / rvs - 1:+8.2%} {rec:17.2%}")
    return m


if __name__ == "__main__":
    # s3dis-like: 4096-pt blocks, res 24 grid, M=1024
    run_setting("s3dis-ish", 4096, 24, 1024)
    # scannet-crop-like: 8192-pt crops, res 40, M=2048
    run_setting("scannet-ish", 8192, 40, 2048)

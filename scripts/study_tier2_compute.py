"""Measure tier 2's replicated-compute fraction on the real chip.

The tier-2 resident forward (parallel/resident.py) shards the DENSE work
(layer-0 encode on each shard's slab, the final decode stage + head on the
slab's points) but runs the COARSE PYRAMID (encoder layers 1.., decoder
stages 0..n-2) REPLICATED on every shard. The scaling projection must
charge that duplicated compute the same way it charges tier 3's ghost rows
(VERDICT r3 weak #2 applied to tier 2): per-shard time is

    dense/D + replicated + t_all_gather     (not  total/D + t_all_gather).

This study measures the split directly, using the stage-drivable model:

  * C  — the full whole-scene forward (bench protocol: folded BN, bf16,
    surface scene, scalar-fetch timing);
  * R  — the replicated portion standalone: encode layers 1..n-1 from the
    assembled layer-1 level, then decode stages 0..n-2 back down to
    level 1 (exactly what every tier-2 shard duplicates);
  * E0 — layer-0 encode alone (cross-check: C ≈ E0 + R + final stage+head).

and compares the measured R/C against `comm_audit.tier2_replicated_fraction`
(the config-only bandwidth/row model the dryrun COMM_REPORT uses), so the
projection constant is anchored on hardware, not on the model's own
assumptions. Results recorded in docs/design.md §13 addendum 2.

The split uses TRACE-DRIVEN DEVICE-BUSY time (the bench protocol), not
wall: each jitted call through the tunnel carries ~0.7-1.1 ms of launch/
fetch overhead, which inflates the small standalone R measurement far
more than the full forward — the first (wall-based) run of this study
read R/C at 0.203 where the busy split puts it materially lower, and at
crop shapes the wall crosscheck even goes NEGATIVE (E0+R > C). Wall
numbers are still printed for the record.

Usage: python scripts/study_tier2_compute.py [--iters 40]
         [--preset scannet_whole_scene]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.models.fold import fold_inference
    from gridgcn_tpu.parallel.comm_audit import tier2_replicated_fraction

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--preset", default="scannet_whole_scene")
    args = ap.parse_args()

    cfg = presets.get(args.preset)
    model, variables = init_model(cfg)
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)
    n_layers = len(cfg.model.layers)
    N = cfg.data.num_points

    from gridgcn_tpu.data.synthetic import synthetic_scene_surface
    xyz = jnp.asarray(synthetic_scene_surface(N, seed=7))[None]
    mask = jnp.ones((1, N), bool)
    key = jax.random.PRNGKey(0)
    # featured configs (e.g. s3dis_seg in_channels=6): synthesize rgb-like
    # channels, same convention as the preset-scale convergence gate
    C_in = cfg.model.in_channels
    feat = (jax.random.uniform(jax.random.PRNGKey(3), (1, N, C_in))
            if C_in else None)

    import tempfile

    from gridgcn_tpu.utils.profiling import busy_ms_per_iter, trace

    def timed(fn, *a, iters=args.iters):
        """(wall_ms, busy_ms) — wall over `iters` async dispatches + one
        fetch, then device-busy ms/iter from a 10-iter trace (exclusive
        event times; identical protocol to bench.py's headline entry)."""
        for _ in range(2):
            float(fn(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*a)
        float(out)
        wall = (time.perf_counter() - t0) / iters * 1e3
        tdir = tempfile.mkdtemp(prefix="tier2_tr_")
        with trace(tdir):
            o = None
            for _ in range(10):
                o = fn(*a)
            float(o)
        busy = busy_ms_per_iter(tdir, 10)
        return wall, busy

    def _l0_feat(x):
        """Layer-0 input features, the __call__ convention: xyz prefix
        (when use_xyz_feature) ++ per-point channels."""
        parts = ([x] if cfg.model.use_xyz_feature else []) + (
            [feat] if feat is not None else [])
        return jnp.concatenate(parts, -1) if parts else None

    @jax.jit
    def full(v, x, m, k):
        return model.apply(v, x, feat, m, train=False,
                           rngs={"cagq": k}).sum()

    @jax.jit
    def enc0(v, x, m, k):
        c_xyz, c_feat, c_valid = model.apply(
            v, 0, x, _l0_feat(x), m, False,
            method="encode_layer", rngs={"cagq": k})
        return c_feat.sum()

    # level-1 tensors (the all_gathered level every tier-2 shard holds)
    g_xyz, g_feat, g_valid = jax.jit(
        lambda v, x, m, k: model.apply(
            v, 0, x, _l0_feat(x), m, False,
            method="encode_layer", rngs={"cagq": k}))(
        variables, xyz, mask, key)

    @jax.jit
    def replicated(v, gx, gf, gm, k):
        """Encoder layers 1.. + decode stages 0..n-2: what EVERY tier-2
        shard re-computes (resident.py 'coarse pyramid: replicated')."""
        levels = [(gx, gf, gm)]
        x_, f_, m_ = gx, gf, gm
        for i in range(1, n_layers):
            x_, f_, m_ = model.apply(
                v, i, x_, f_, m_, False, None,
                method="encode_layer",
                rngs={"cagq": jax.random.fold_in(k, 10_000 + i)})
            levels.append((x_, f_, m_))
        c_xyz, c_feat, c_mask = levels[-1]
        for i in range(n_layers - 1):
            d_xyz, d_feat, d_mask = levels[-2 - i]
            c_feat = model.apply(
                v, i, c_xyz, c_feat, c_mask, d_xyz, d_feat, d_mask, False,
                method="decode_stage",
                rngs={"cagq": jax.random.fold_in(k, 20_000 + i)})
            c_xyz, c_mask = d_xyz, d_mask
        return c_feat.sum()

    Cw, Cb = timed(full, variables, xyz, mask, key)
    Rw, Rb = timed(replicated, variables, g_xyz, g_feat, g_valid, key)
    E0w, E0b = timed(enc0, variables, xyz, mask, key)

    # raw model (anchored=False): this study IS the anchor's provenance —
    # comparing against the anchored value would be circular
    model_frac = tier2_replicated_fraction(cfg, anchored=False)
    out = {
        "preset": args.preset,
        "backend": jax.default_backend(),
        "full_busy_ms": round(Cb, 3) if Cb else None,
        "replicated_busy_ms": round(Rb, 3) if Rb else None,
        "enc0_busy_ms": round(E0b, 3) if E0b else None,
        "measured_replicated_frac":
            round(Rb / Cb, 4) if (Cb and Rb) else None,
        "model_replicated_frac": round(model_frac, 4),
        "crosscheck_final_stage_head_busy_ms":
            round(Cb - Rb - E0b, 3) if (Cb and Rb and E0b) else None,
        "wall_ms": {"full": round(Cw, 3), "replicated": round(Rw, 3),
                    "enc0": round(E0w, 3),
                    "replicated_frac_wall": round(Rw / Cw, 4)},
    }
    print("TIER2_COMPUTE " + json.dumps(out))


if __name__ == "__main__":
    main()

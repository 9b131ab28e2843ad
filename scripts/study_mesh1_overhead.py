"""Zero-comm sanity point for the scaling audit (design.md §13).

Runs the tier-2 and tier-3 spatially-sharded forwards on a mesh of ONE
real chip and compares steady-state latency against the plain unsharded
forward on the same whole-scene input. At D=1 every ppermute/all_gather
is a self-copy, so any gap over the plain forward is pure protocol
overhead (shard_map plumbing, ghost buffers, slab bookkeeping) — the
fixed cost the §13 ICI projection sits on top of.

`--train` (VERDICT r4 #2) runs the same protocol in TRAIN mode: a plain
unsharded whole-scene train step (same model, same scene, loss + backward
+ Adam) against the tier-3 spatial train step at mesh=1, plus the
ghost-cap sweep — the points that fit the TRAIN-side ghost-tax constants
(comm_audit.GHOST_TAX_TRAIN_*). The backward pass roughly doubles row
traffic through the ghost buffers and differentiates every ppermute, so
the inference-fit tax did not transfer on trust.

Usage: python scripts/study_mesh1_overhead.py [--iters 20] [--ghost-sweep]
       python scripts/study_mesh1_overhead.py --train [--ghost-sweep]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, warmup=2):
    """bench.py protocol: fn must return a SCALAR; fetching it is the only
    reliable sync on the remote-tunnel backend (block_until_ready can return
    before execution finishes there). Pipelined launches, one final fetch.
    Returns (wall_ms, busy_ms): busy from a 10-iter device trace — the
    honest numerator/denominator for ratios of runs this size (~1 ms/call
    of tunnel launch overhead rides on wall; see study_tier2_compute)."""
    import tempfile

    from gridgcn_tpu.utils.profiling import busy_ms_per_iter, trace

    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out)
    wall = (time.perf_counter() - t0) / iters * 1e3
    tdir = tempfile.mkdtemp(prefix="mesh1_tr_")
    with trace(tdir):
        o = None
        for _ in range(10):
            o = fn(*args)
        float(o)
    busy = busy_ms_per_iter(tdir, 10)
    return wall, busy


def _affine_fit(ratios, overheads):
    """Least-squares (fixed, coeff) for overhead ≈ fixed + coeff·ratio."""
    A = np.stack([np.ones(len(ratios)), np.asarray(ratios)], axis=1)
    sol, *_ = np.linalg.lstsq(A, np.asarray(overheads), rcond=None)
    return float(sol[0]), float(sol[1])


def main_train(args):
    """TRAIN-mode protocol study (VERDICT r4 #2): plain unsharded
    whole-scene train step vs tier-3 spatial train step at mesh=1, plus
    the ghost-cap sweep that fits the train-side tax constants.

    Config: `scannet_seg` — the config whose train efficiency the §13
    projection actually quotes (its crop-DP step is the measured train
    anchor), on one 65536-pt surface scene (the 8×8192 crop budget as a
    single spatial scene). Postmortem note: a first attempt used
    `scannet_whole_scene` and appeared to hang >40 min in compile — that
    was a WEDGED remote-compile queue (caused by an earlier timeout-kill
    of a traced bench process; see the verify skill's warning), not the
    graph: re-measured on a healthy queue, the B=1 N=81920 whole-scene
    TRAIN graph compiles in 28.9 s. scannet_seg remains the right config
    here because §13's train projection quotes IT."""
    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.data.synthetic import synthetic_scene_surface
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batch)
    from gridgcn_tpu.train.steps import create_train_state, make_train_step

    cfg = presets.get(args.preset)
    N = cfg.data.num_points * cfg.data.batch_size
    cfg = apply_overrides(cfg, {"data.num_points": N,
                                "data.batch_size": 1,
                                "data.augment": False})
    print(f"config {cfg.name}: one {N}-pt scene, B=1", flush=True)
    model, variables = init_model(cfg)
    xyz = np.asarray(synthetic_scene_surface(N, seed=7), np.float32)
    mask = np.ones((N,), bool)
    labels = np.random.default_rng(0).integers(
        0, cfg.model.num_classes, N).astype(np.int32)

    def runner(step, state, batch, rng):
        cell = {"s": state}

        def fn():
            cell["s"], m = step(cell["s"], batch, rng)
            return m["loss"]
        return fn

    rng = jax.random.PRNGKey(0)

    # ---- plain unsharded whole-scene train step (the zero-protocol bar;
    # the SAME model/scene/optimizer the tier-3 step runs, so the gap is
    # pure protocol overhead exactly as in the inference study) ----
    state_p = create_train_state(cfg, model, variables, steps_per_epoch=8)
    plain = make_train_step(cfg, model, donate=False)
    batch_p = {"xyz": jnp.asarray(xyz)[None],
               "label": jnp.asarray(labels)[None],
               "mask": jnp.asarray(mask)[None]}
    print("compiling plain train step ...", flush=True)
    t_plain, b_plain = timed(runner(plain, state_p, batch_p, rng),
                             iters=args.iters)
    print(f"plain train step:       {t_plain:8.2f} ms wall, "
          f"{b_plain and round(b_plain, 2)} busy", flush=True)

    # ---- tier-3 spatial train step at D=1, full-share + swept caps ----
    mesh = make_mesh(1)
    sbatch = shard_scene_batch(cfg, xyz, labels, mask, mesh, N)
    points = []
    for div in (0, 2, 4, 8):            # 0 = full-share default (ratio ~2)
        if div:
            caps = tuple(max(8, l.n_centers // div)
                         for l in cfg.model.layers)
        else:
            caps = tuple(max(8, l.n_centers) for l in cfg.model.layers)
        ratio = sum(2 * c for c in caps) / sum(
            l.n_centers for l in cfg.model.layers)
        state_s = create_train_state(cfg, model, variables,
                                     steps_per_epoch=8)
        sstep = make_spatial_train_step(cfg, mesh, tier="resident_ml",
                                        ghost_cap=caps if div else 0)
        print(f"compiling tier-3 train step (div={div}) ...", flush=True)
        t_s, b_s = timed(runner(sstep, state_s, sbatch, rng),
                         iters=args.iters)
        have_busy = bool(b_s and b_plain)
        m_s, mp = (b_s, b_plain) if have_busy else (t_s, t_plain)
        unit = "busy" if have_busy else "wall (no trace)"
        over = m_s / mp - 1
        points.append((ratio, over))
        tag = "full-share" if not div else f"share/{div}"
        print(f"tier-3 TRAIN {tag:>10}: {m_s:8.2f} ms {unit} "
              f"(ratio {ratio:.3f}; +{over * 100:.1f}% over plain)",
              flush=True)
        if not args.ghost_sweep and div:
            break                        # one comparison point suffices

    if args.ghost_sweep and len(points) >= 3:
        fixed, coeff = _affine_fit([p[0] for p in points],
                                   [p[1] for p in points])
        print(f"TRAIN tax affine fit: fixed={fixed:.4f} "
              f"coeff={coeff:.4f}  (inference fit: 0.0096 + 0.1631·ratio)")
        print("-> update comm_audit.GHOST_TAX_TRAIN_FIXED/COEFF with these "
              "constants and the measured points as provenance")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ghost-sweep", action="store_true",
                    help="also sweep tier-3 ghost_cap at D=1 to validate "
                         "the linear ghost-compute-tax model (round 4)")
    ap.add_argument("--train", action="store_true",
                    help="TRAIN-mode protocol study (VERDICT r4 #2)")
    ap.add_argument("--preset", default=None,
                    help="config preset (default: scannet_seg in --train "
                         "mode, scannet_whole_scene otherwise); batch>1 "
                         "presets run as ONE B=1 scene of B*N points")
    args = ap.parse_args()
    if args.preset is None:
        args.preset = "scannet_seg" if args.train else "scannet_whole_scene"

    if args.train:
        main_train(args)
        return

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.data.synthetic import synthetic_scene_surface
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.models.fold import fold_inference
    from gridgcn_tpu.parallel.mesh import make_mesh

    cfg = presets.get(args.preset)
    N = cfg.data.num_points * cfg.data.batch_size
    if cfg.data.batch_size != 1:
        cfg = apply_overrides(cfg, {"data.num_points": N,
                                    "data.batch_size": 1,
                                    "data.augment": False})
        print(f"config {cfg.name} as one {N}-pt scene, B=1", flush=True)
    model, variables = init_model(cfg)
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)

    xyz = np.asarray(synthetic_scene_surface(N, seed=7), np.float32)
    mask = np.ones((N,), bool)
    rng = jax.random.PRNGKey(0)

    # ---- plain unsharded forward (the headline path) ----
    @jax.jit
    def forward(variables, xyz, mask, key):
        return model.apply(variables, xyz, None, mask, train=False,
                           rngs={"cagq": key}).sum()

    xyz_d = jax.device_put(jnp.asarray(xyz)[None])
    mask_d = jax.device_put(jnp.asarray(mask)[None])
    t_plain, b_plain = timed(forward, variables, xyz_d, mask_d, rng,
                             iters=args.iters)
    print(f"plain unsharded:      {t_plain:8.2f} ms/scene wall, "
          f"{b_plain and round(b_plain, 2)} busy")

    mesh = make_mesh(1)

    # ---- tier 3 (resident-ml) at D=1 ----
    from gridgcn_tpu.parallel import resident_ml as rml
    from gridgcn_tpu.parallel.resident import resident_halo
    from gridgcn_tpu.parallel.spatial import partition_scene, suggest_capacity
    from gridgcn_tpu.ops.voxelize import grid_bounds

    res0 = cfg.model.layers[0].resolution
    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None], res0)
    origin = np.asarray(origin)[0]
    extent = np.asarray(vsize)[0] * res0 / (1.0 + 1e-5)
    halo = resident_halo(cfg, np.asarray(vsize)[0])
    cap = suggest_capacity(xyz, mask, 1, halo)
    sx, sm, owned, sidx, edges = partition_scene(xyz, mask, 1, halo, cap)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from gridgcn_tpu.parallel.mesh import DATA_AXIS
    sh = NamedSharding(mesh, P(DATA_AXIS))
    var_r = jax.device_put(variables, NamedSharding(mesh, P()))
    sx_d, sm_d = jax.device_put(sx, sh), jax.device_put(sm, sh)
    e_d, o_d, x_d = jnp.asarray(edges), jnp.asarray(origin), jnp.asarray(extent)

    fwd3 = rml.make_resident_ml_forward(cfg, mesh)
    t3, b3 = timed(lambda: jnp.sum(fwd3(var_r, sx_d, sm_d, e_d, o_d, x_d,
                                        rng)[0]), iters=args.iters)
    print(f"tier-3 resident-ml@1: {t3:8.2f} ms/scene wall "
          f"(+{(t3 / t_plain - 1) * 100:.1f}%), capacity {cap}")
    if b3 and b_plain:
        print(f"   busy: {b3:.2f} vs {b_plain:.2f} = "
              f"+{(b3 / b_plain - 1) * 100:.1f}% ghost-compute overhead "
              f"(the GHOST_TAX_COEFF anchor)")

    if args.ghost_sweep:
        # Validate the ghost-compute tax's LINEAR model (comm_audit.
        # ghost_compute_tax, anchored on the full-share point above) with
        # more measured points: at D=1 the boundary bands are empty
        # (lo/hi are ±inf), so ghost buffers are pure padding and their
        # compute cost can be swept without overflow. ratio = 2H/share.
        from gridgcn_tpu.parallel.comm_audit import (
            GHOST_TAX_COEFF, GHOST_TAX_FIXED)
        for div in (2, 4, 8):
            caps = tuple(max(8, l.n_centers // div)
                         for l in cfg.model.layers)
            ratio = sum(2 * c for c in caps) / sum(
                l.n_centers for l in cfg.model.layers)
            fwd3c = rml.make_resident_ml_forward(cfg, mesh, ghost_cap=caps)
            t3c, b3c = timed(lambda f=fwd3c: jnp.sum(
                f(var_r, sx_d, sm_d, e_d, o_d, x_d, rng)[0]),
                iters=args.iters)
            # label follows the same fallback branch that picks the numbers
            # (ADVICE r4 #3): wall numbers carry ~1 ms/call tunnel overhead
            have_busy = bool(b3c and b_plain)
            m3c, mp = (b3c, b_plain) if have_busy else (t3c, t_plain)
            unit = "busy" if have_busy else "wall (no trace)"
            pred = mp * (1 + GHOST_TAX_FIXED + GHOST_TAX_COEFF * ratio)
            print(f"tier-3 ghost_cap=share/{div}: {m3c:8.2f} ms/scene {unit} "
                  f"(ratio {ratio:.3f}; measured +{(m3c / mp - 1) * 100:.1f}% "
                  f"vs model-predicted +{(pred / mp - 1) * 100:.1f}%)")

    # ---- tier 2 (resident) at D=1 (takes vsize, not extent) ----
    from gridgcn_tpu.parallel import resident as r2
    v_d = jnp.asarray(np.asarray(vsize)[0])
    fwd2 = r2.make_resident_forward(cfg, mesh)
    t2, b2 = timed(lambda: jnp.sum(fwd2(var_r, sx_d, sm_d, e_d, o_d, v_d,
                                        rng)),
                   iters=args.iters)
    print(f"tier-2 resident@1:    {t2:8.2f} ms/scene wall "
          f"(+{(t2 / t_plain - 1) * 100:.1f}%)"
          + (f"; busy {b2:.2f} vs {b_plain:.2f} = "
             f"+{(b2 / b_plain - 1) * 100:.1f}%" if (b2 and b_plain) else ""))


if __name__ == "__main__":
    main()

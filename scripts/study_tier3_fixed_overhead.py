"""Attribute tier-3's FIXED protocol overhead (design.md §13 addendum).

The round-4 busy-time ghost-cap sweep fit the ghost-compute tax affine:
tax = 0.0935 + 0.1142·ratio. The slope is ghost rows riding through
sampling/gather/GCA — understood and cap-tunable. The FIXED ~9.4% is
not: it is whatever the resident-ml protocol pays at mesh=1 even with
near-empty ghost buffers (slab bookkeeping, boundary-band maintenance,
ghost pack/unpack, the overflow counters). This study names it: capture
device traces of the plain unsharded forward and the tier-3 forward at
the smallest caps, diff the per-op exclusive-time attributions, and
print the ops that grew (or only exist) under the protocol, ranked.

Whatever dominates that diff is the optimization target for the fixed
term — or the proof that it is irreducible (e.g. if it is the same
gather/scatter ops running on padded shapes).

Usage: python scripts/study_tier3_fixed_overhead.py [--iters 10]
"""

import argparse
import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def attribution(logdir: str, iters: int) -> dict:
    """op name -> exclusive ms/iter, summed across device cores."""
    from gridgcn_tpu.utils.traceview import exclusive_times, load_events

    excl = collections.defaultdict(float)
    for events in load_events(logdir).values():
        for n, ps in exclusive_times(events).items():
            excl[n] += ps / iters / 1e9
    return dict(excl)


def _diff_report(plain: dict, t3: dict, topn: int, label: str):
    tot_p, tot_3 = sum(plain.values()), sum(t3.values())
    print(f"busy/iter: plain {tot_p:.3f} ms, {label} "
          f"{tot_3:.3f} ms, diff {tot_3 - tot_p:+.3f} "
          f"({(tot_3 / tot_p - 1) * 100:+.1f}%)")
    print(f"\n{'Δ ms':>9}  {'tier3':>8}  {'plain':>8}  op")
    names = set(plain) | set(t3)
    rows = sorted(((t3.get(n, 0.0) - plain.get(n, 0.0), n) for n in names),
                  key=lambda r: -abs(r[0]))
    for d, n in rows[:topn]:
        print(f"{d:+9.4f}  {t3.get(n, 0.0):8.4f}  {plain.get(n, 0.0):8.4f}"
              f"  {n[:95]}")


def main_train(args):
    """TRAIN-mode twin (round 5): name the +3.4% fixed term of the
    measured train-side tax (comm_audit.GHOST_TAX_TRAIN_FIXED) the same
    way the r4 study named (and de-bugged) the inference fixed term —
    diff per-op exclusive attributions of the plain scene train step vs
    the tier-3 spatial train step at near-empty caps (share/8, ghost
    slope ~0.25·0.038 ≈ 1%, so the diff is dominated by the fixed term).
    Same config as the tax fit: scannet_seg on one 65536-pt scene."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.data.synthetic import synthetic_scene_surface
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batch)
    from gridgcn_tpu.train.steps import create_train_state, make_train_step
    from gridgcn_tpu.utils.profiling import trace

    cfg = presets.get("scannet_seg")
    N = cfg.data.num_points * cfg.data.batch_size
    cfg = apply_overrides(cfg, {"data.num_points": N,
                                "data.batch_size": 1,
                                "data.augment": False})
    model, variables = init_model(cfg)
    xyz = np.asarray(synthetic_scene_surface(N, seed=7), np.float32)
    mask = np.ones((N,), bool)
    labels = np.random.default_rng(0).integers(
        0, cfg.model.num_classes, N).astype(np.int32)
    rng = jax.random.PRNGKey(0)

    def capture(step, state, batch):
        cell = {"s": state}

        def fn():
            cell["s"], m = step(cell["s"], batch, rng)
            return m["loss"]
        for _ in range(2):
            float(fn())
        tdir = tempfile.mkdtemp(prefix="t3fixtr_")
        with trace(tdir):
            o = None
            for _ in range(args.iters):
                o = fn()
            float(o)
        return attribution(tdir, args.iters)

    state_p = create_train_state(cfg, model, variables, steps_per_epoch=8)
    plain_step = make_train_step(cfg, model, donate=False)
    batch_p = {"xyz": jnp.asarray(xyz)[None],
               "label": jnp.asarray(labels)[None],
               "mask": jnp.asarray(mask)[None]}
    plain = capture(plain_step, state_p, batch_p)

    mesh = make_mesh(1)
    caps = tuple(max(8, l.n_centers // 8) for l in cfg.model.layers)
    sbatch = shard_scene_batch(cfg, xyz, labels, mask, mesh, N)
    state_s = create_train_state(cfg, model, variables, steps_per_epoch=8)
    sstep = make_spatial_train_step(cfg, mesh, tier="resident_ml",
                                    ghost_cap=caps)
    t3 = capture(sstep, state_s, sbatch)
    _diff_report(plain, t3, args.topn, "tier-3@1 TRAIN caps=share/8")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.data.synthetic import synthetic_scene_surface
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.models.fold import fold_inference
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.utils.profiling import trace

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--topn", type=int, default=25)
    ap.add_argument("--train", action="store_true",
                    help="attribute the TRAIN-side fixed term (round 5)")
    args = ap.parse_args()
    if args.train:
        main_train(args)
        return

    cfg = presets.get("scannet_whole_scene")
    N = cfg.data.num_points
    model, variables = init_model(cfg)
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)

    xyz = np.asarray(synthetic_scene_surface(N, seed=7), np.float32)
    mask = np.ones((N,), bool)
    rng = jax.random.PRNGKey(0)

    def capture(fn, *a):
        for _ in range(2):
            float(fn(*a))
        tdir = tempfile.mkdtemp(prefix="t3fix_")
        with trace(tdir):
            o = None
            for _ in range(args.iters):
                o = fn(*a)
            float(o)
        return attribution(tdir, args.iters)

    @jax.jit
    def forward(variables, xyz, mask, key):
        return model.apply(variables, xyz, None, mask, train=False,
                           rngs={"cagq": key}).sum()

    plain = capture(forward, variables, jnp.asarray(xyz)[None],
                    jnp.asarray(mask)[None], rng)

    # tier-3 at D=1, smallest caps (share/8): ghost slope ~0.25·0.114 ≈ 3%
    # of the measured +13.6%, so the diff below is dominated by the FIXED
    # term this study exists to name
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridgcn_tpu.ops.voxelize import grid_bounds
    from gridgcn_tpu.parallel import resident_ml as rml
    from gridgcn_tpu.parallel.mesh import DATA_AXIS
    from gridgcn_tpu.parallel.resident import resident_halo
    from gridgcn_tpu.parallel.spatial import partition_scene, suggest_capacity

    mesh = make_mesh(1)
    res0 = cfg.model.layers[0].resolution
    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None], res0)
    origin = np.asarray(origin)[0]
    extent = np.asarray(vsize)[0] * res0 / (1.0 + 1e-5)
    halo = resident_halo(cfg, np.asarray(vsize)[0])
    cap = suggest_capacity(xyz, mask, 1, halo)
    sx, sm, owned, sidx, edges = partition_scene(xyz, mask, 1, halo, cap)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    var_r = jax.device_put(variables, NamedSharding(mesh, P()))
    sx_d, sm_d = jax.device_put(sx, sh), jax.device_put(sm, sh)
    e_d, o_d, x_d = (jnp.asarray(edges), jnp.asarray(origin),
                     jnp.asarray(extent))
    caps = tuple(max(8, l.n_centers // 8) for l in cfg.model.layers)
    fwd3 = rml.make_resident_ml_forward(cfg, mesh, ghost_cap=caps)
    t3 = capture(lambda: jnp.sum(fwd3(var_r, sx_d, sm_d, e_d, o_d, x_d,
                                      rng)[0]))

    tot_p, tot_3 = sum(plain.values()), sum(t3.values())
    print(f"busy/iter: plain {tot_p:.3f} ms, tier-3@1 caps=share/8 "
          f"{tot_3:.3f} ms, diff {tot_3 - tot_p:+.3f} "
          f"({(tot_3 / tot_p - 1) * 100:+.1f}%)")
    print(f"\n{'Δ ms':>9}  {'tier3':>8}  {'plain':>8}  op")
    names = set(plain) | set(t3)
    rows = sorted(((t3.get(n, 0.0) - plain.get(n, 0.0), n) for n in names),
                  key=lambda r: -abs(r[0]))
    for d, n in rows[:args.topn]:
        print(f"{d:+9.4f}  {t3.get(n, 0.0):8.4f}  {plain.get(n, 0.0):8.4f}"
              f"  {n[:95]}")


if __name__ == "__main__":
    main()

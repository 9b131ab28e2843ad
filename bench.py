"""F-18: headline benchmark harness (SURVEY.md §2.3, §6).

Times the headline metric from BASELINE.md: whole-scene ScanNet-style
segmentation inference points/sec on one chip (reference: 81920 pts/scene at
~20 ms ≈ 4.1 M points/sec on a 2019 GPU, paper abstract). Protocol follows
the reference's latency scripts: jit-compile, warm up, then time synced
steady-state forwards with `block_until_ready`.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/sec/chip", "vs_baseline": N}
plus (stderr) a breakdown including ModelNet40 batch latency.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_POINTS_PER_SEC = 81920 / 0.020   # ≈ 4.096 M pts/s, BASELINE.md
# MFU is reported for normalization, not as the optimization target: the
# model is mixed bf16/f32 and gather/DMA-dominated by design (docs/design.md
# §10-§11). Hardware constants shared with the comm audit (ADVICE r4 #4).
from gridgcn_tpu.utils.hw import (  # noqa: E402
    DMA_ROWS_PER_S, V5E_HBM_BYTES_PER_S, V5E_PEAK_FLOPS)


def _time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Steady-state per-iteration time.

    `fn` must return a scalar (e.g. logits.sum()): fetching the scalar is the
    only reliable synchronization on remote-tunnel TPU backends, where
    block_until_ready can return before execution finishes. Timing launches
    `iters` pipelined steps and fetches only the last scalar, so the single
    host↔device round trip amortizes away."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def _scene_points(scene: str, batch_size: int, N: int, key):
    """Benchmark input clouds. 'uniform' = the round-1 protocol (uniform
    cube); 'surface' = indoor-scan stand-in with surface geometry and
    skewed voxel occupancy (VERDICT r1 weak #4 — realistic density)."""
    if scene == "uniform":
        return jax.random.uniform(key, (batch_size, N, 3), minval=0.0,
                                  maxval=6.0)
    from gridgcn_tpu.data.synthetic import synthetic_scene_surface
    pts = np.stack([synthetic_scene_surface(N, seed=7 + i)
                    for i in range(batch_size)])
    return jnp.asarray(pts)


def _capacity_report(cfg, xyz, mask):
    """Layer-0 voxel-table capacity audit for the bench scene (dropped-point
    fraction under nv; utils/debug budget is 5%). Host-side, untimed."""
    from gridgcn_tpu.ops.voxelize import build_voxel_table, capacity_stats

    spec = cfg.model.layers[0]
    table = build_voxel_table(xyz, mask, spec.resolution, spec.nv,
                              jax.random.PRNGKey(0))
    stats = capacity_stats(table)
    return {
        "resolution": spec.resolution, "nv": spec.nv,
        "dropped_frac": round(float(jnp.max(stats["dropped_frac"])), 5),
        "occupied_voxels": int(jnp.max(stats["occupied_voxels"])),
    }


def _busy_ms_per_iter(logdir: str, iters: int) -> float | None:
    """Moved to utils.profiling.busy_ms_per_iter (shared with the tier-2
    compute study); thin alias kept for the bench's internal call sites."""
    from gridgcn_tpu.utils.profiling import busy_ms_per_iter

    return busy_ms_per_iter(logdir, iters)


def bench_seg_whole_scene(batch_size: int, iters: int, knn: str = "auto",
                          scenes=("uniform",), trace_dir: str | None = None,
                          want_trace: bool = True):
    """Whole-scene segmentation inference throughput (BASELINE config 5).
    All requested scene geometries share ONE jitted forward (identical
    shapes), so the model compiles once.

    The headline (last) scene also gets a 10-iter device trace and a
    compiled cost analysis so the artifact carries busy-time, FLOPs and
    MFU alongside wall latency (VERDICT r2 item 2) — wall time through the
    tunnel backend over-reads chip residency by ~1 ms/iter at iters=40."""
    import dataclasses

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.models.build import init_model

    cfg = presets.get("scannet_whole_scene")
    if batch_size != cfg.data.batch_size:
        cfg = apply_overrides(cfg, {"data.batch_size": batch_size})
    if knn != "auto":
        ups = tuple(dataclasses.replace(u, method=knn)
                    for u in cfg.model.up_layers)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, up_layers=ups))
    N = cfg.data.num_points
    model, variables = init_model(cfg)

    # inference protocol: BN folded into Dense weights (models/fold.py) —
    # the standalone BN affines cost ~0.3 ms/scene materialized on TPU
    from gridgcn_tpu.models.build import build_model
    from gridgcn_tpu.models.fold import fold_inference
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)

    @jax.jit
    def forward(variables, xyz, mask, key):
        logits = model.apply(variables, xyz, None, mask, train=False,
                             rngs={"cagq": key})
        return logits.sum()   # scalar sync token (see _time_fn)

    rng = jax.random.PRNGKey(0)
    mask = jnp.ones((batch_size, N), bool)
    out = {}
    for i, scene in enumerate(scenes):
        xyz = _scene_points(scene, batch_size, N, rng)
        dt = _time_fn(forward, variables, xyz, mask, rng, iters=iters)
        entry = {
            "scene_points": N,
            "batch_size": batch_size,
            "scene": scene,
            "latency_ms": dt * 1000,
            "points_per_sec": batch_size * N / dt,
            "capacity": _capacity_report(cfg, xyz, mask),
        }
        if want_trace and i == len(scenes) - 1:
            # capture the headline scene's steady state for exclusive-time
            # attribution (utils/traceview; drove every BASELINE.md win)
            from gridgcn_tpu.utils.profiling import trace

            tdir = trace_dir or tempfile.mkdtemp(prefix="gridgcn_bench_tr_")
            trace_iters = 10
            with trace(tdir):
                o = None
                for _ in range(trace_iters):
                    o = forward(variables, xyz, mask, rng)
                float(o)
            busy = _busy_ms_per_iter(tdir, trace_iters)
            compiled = None
            try:
                compiled = forward.lower(variables, xyz, mask, rng).compile()
                ca = compiled.cost_analysis()
                flops = float(ca.get("flops", 0.0)) or None
                byts = float(ca.get("bytes accessed", 0.0)) or None
            except Exception:
                flops = byts = None
            entry["busy_ms"] = busy
            entry["flops"] = flops
            if flops and busy:
                entry["achieved_tflops"] = flops / (busy / 1e3) / 1e12
                entry["mfu"] = flops / (busy / 1e3) / V5E_PEAK_FLOPS
            if byts:
                # cost_analysis' aggregate is kept for comparability, but
                # it OVERCHARGES gathers ~8x (it bills the full table per
                # gather — utils/hlocost.py + study_bytes --calibrate), so
                # round-4's bandwidth_bound_frac built on it was inflated
                entry["hbm_bytes_hlo_cost_model"] = byts
            if compiled is not None and busy:
                # honest composite floor: per-kernel TOUCHED bytes at the
                # HBM rate + gather/scatter rows at the measured DMA
                # descriptor rate (the design is row-rate-bound, design.md
                # §10/§14); floor_frac = floor / busy is the efficiency
                # metric that replaces round-4's bandwidth_bound_frac
                from gridgcn_tpu.utils.hlocost import attribute, floor_ms
                try:
                    fl = floor_ms(attribute(compiled.as_text()))
                    entry["hbm_bytes_touched"] = fl["touched_bytes"]
                    entry["gather_mrows"] = fl["rows"] / 1e6
                    entry["composite_floor_ms"] = fl["floor_ms"]
                    entry["floor_frac"] = fl["floor_ms"] / busy
                except Exception:
                    pass
        out[scene] = entry
    return out


def bench_modelnet40_latency(iters: int):
    """ModelNet40 inference latency, batch 16 @ 1024 pts (SURVEY §6)."""
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import init_model

    cfg = presets.get("modelnet40_full")
    B, N = 16, cfg.data.num_points
    model, variables = init_model(cfg)
    from gridgcn_tpu.models.build import build_model
    from gridgcn_tpu.models.fold import fold_inference
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (B, N, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((B, N), bool)

    @jax.jit
    def forward(variables, xyz, mask, key):
        logits = model.apply(variables, xyz, None, mask, train=False,
                             rngs={"cagq": key})
        return logits.sum()   # scalar sync token (see _time_fn)

    dt = _time_fn(forward, variables, xyz, mask, rng, iters=iters)
    return {"batch_size": B, "num_points": N, "latency_ms": dt * 1000}


def bench_train_step(iters: int):
    """Training throughput (points/sec) on the ScanNet-crop seg config —
    full jitted step: on-device augment + CAGQ + forward + backward + Adam."""
    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.data.pipeline import make_dataset
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.train.steps import create_train_state, build_train_step

    cfg = presets.get("scannet_seg")
    model, variables = init_model(cfg)
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "seg")
    state = create_train_state(cfg, model, variables, 100)
    raw = build_train_step(cfg, model)

    @jax.jit
    def step(state, batch, rng):
        state, metrics = raw(state, batch, rng)
        return state, metrics["loss"]

    batch = {k: jnp.asarray(v) for k, v in
             next(ds.batches(cfg.data.batch_size, seed=0)).items()}
    rng = jax.random.PRNGKey(0)

    state, loss = step(state, batch, rng)
    float(loss)                                   # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch, rng)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    pts = cfg.data.batch_size * cfg.data.num_points
    return {"config": cfg.name, "batch_points": pts,
            "step_ms": dt * 1000, "train_points_per_sec": pts / dt}


def bench_spatial_train_step(iters: int):
    """Tier-3 spatially-sharded training at mesh=1 — the per-chip unit of
    the F-22 scaling story (SURVEY §2.4), as a standing regression metric:
    `scannet_seg` as one 65536-pt surface scene (B=1), trained through
    `make_spatial_train_step` (owned-masked loss, ghost protocol at D=1,
    full-share default caps). Same protocol as the §13 train anchor
    (`study_mesh1_overhead.py --train`; measured 11.26 ms busy + the
    full-share ghost tax in round 5)."""
    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.data.synthetic import synthetic_scene_surface
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batch)
    from gridgcn_tpu.train.steps import create_train_state

    cfg = presets.get("scannet_seg")
    N = cfg.data.num_points * cfg.data.batch_size
    cfg = apply_overrides(cfg, {"data.num_points": N, "data.batch_size": 1,
                                "data.augment": False})
    model, variables = init_model(cfg)
    xyz = np.asarray(synthetic_scene_surface(N, seed=7), np.float32)
    mask = np.ones((N,), bool)
    labels = np.random.default_rng(0).integers(
        0, cfg.model.num_classes, N).astype(np.int32)

    mesh = make_mesh(1)
    batch = shard_scene_batch(cfg, xyz, labels, mask, mesh, N)
    state = create_train_state(cfg, model, variables, steps_per_epoch=8)
    step = make_spatial_train_step(cfg, mesh, tier="resident_ml")
    rng = jax.random.PRNGKey(0)

    # TWO warmup steps: the first compiles against the fresh (unsharded)
    # state, the second recompiles once the output state carries the mesh
    # shardings — only then is the dispatch steady
    for _ in range(2):
        state, m = step(state, batch, rng)
        float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return {"config": cfg.name, "scene_points": N, "mesh": 1,
            "tier": 3, "step_ms": dt * 1000,
            "train_points_per_sec": N / dt}


def bench_cagq_vs_fps(iters: int):
    """Data-structuring speedup (paper's 'up to ~50× vs FPS+ball query'):
    time CAGQ (voxel build + RVS + node gather) against FPS + ball query at
    the whole-scene L1 setting (N=81920 → M=8192 centers, K=32)."""
    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.ops import cagq
    from gridgcn_tpu.ops.fps import ball_query, farthest_point_sampling

    cfg = presets.get("scannet_whole_scene")
    spec = cfg.model.layers[0]
    N, M, K = cfg.data.num_points, spec.n_centers, spec.k_neighbors
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (1, N, 3), minval=0.0, maxval=6.0)
    mask = jnp.ones((1, N), bool)

    cagq_fn = jax.jit(lambda x, m, k: cagq(
        x, m, spec, k).groups.neighbor_idx.sum())
    fps_fn = jax.jit(lambda x, m, k: ball_query(
        x, m, jnp.take_along_axis(
            x, farthest_point_sampling(x, m, M, k)[..., None], axis=1),
        0.1, K)[0].sum())

    t_cagq = _time_fn(cagq_fn, xyz, mask, rng, iters=iters)
    # FPS side runs seconds/iter; a few iterations suffice (launch overhead
    # is negligible at that scale) and keep the default bench under a minute
    t_fps = _time_fn(fps_fn, xyz, mask, rng, warmup=1,
                     iters=max(2, min(3, iters // 3)))
    return {"n_points": N, "m_centers": M, "k": K,
            "cagq_ms": t_cagq * 1000, "fps_ball_ms": t_fps * 1000,
            "speedup": t_fps / t_cagq}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=1)
    # 40+: each launch through a tunneled backend carries ~1.1 ms dispatch
    # and the final scalar fetch ~25-35 ms; the fixed fetch cost amortizes
    # over the pipelined iterations, so iters=20 reads ~1.4 ms/scene above
    # true chip residency (trace: 13.8 ms busy vs 15.2 reported) and
    # iters=10 ~3 ms (docs/design.md §7, §10)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--knn", default="auto",
                   choices=["auto", "dense", "pallas", "grid"])
    # everything a regression bot needs rides the DEFAULT invocation
    # (VERDICT r2 item 2): headline + busy/FLOPs/MFU + modelnet40 +
    # train_step + cagq_vs_fps. --quick drops the extras for fast iteration.
    p.add_argument("--quick", action="store_true",
                   help="headline scenes only: skip modelnet40, train step, "
                        "CAGQ-vs-FPS, and the trace/MFU capture")
    p.add_argument("--skip-modelnet", action="store_true")
    p.add_argument("--scene", default="both",
                   choices=["uniform", "surface", "both"],
                   help="bench input geometry; headline uses 'surface' "
                        "(realistic skewed density) when 'both'")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="keep the headline device trace in DIR and print "
                        "the exclusive-time attribution (stderr)")
    args = p.parse_args(argv)

    scenes = (["uniform", "surface"] if args.scene == "both"
              else [args.scene])
    runs = bench_seg_whole_scene(args.batch_size, args.iters,
                                 knn=args.knn, scenes=scenes,
                                 trace_dir=args.trace,
                                 want_trace=not args.quick or bool(args.trace))
    if args.trace:
        from gridgcn_tpu.utils.traceview import report
        try:
            print(report(args.trace, iters=10), file=sys.stderr)
        except Exception as e:   # xplane proto availability varies
            print(f"trace captured in {args.trace}; report failed: {e}",
                  file=sys.stderr)
    # headline = surface (realistic density) when available; uniform
    # numbers stay in the detail for round-over-round comparison
    seg = runs.get("surface", runs[scenes[0]])
    detail = {"seg_whole_scene": seg,
              **({"seg_whole_scene_uniform": runs["uniform"]}
                 if "uniform" in runs and seg is not runs["uniform"] else {}),
              "device": str(jax.devices()[0]),
              "baseline_points_per_sec": BASELINE_POINTS_PER_SEC}
    if not (args.skip_modelnet or args.quick):
        detail["modelnet40"] = bench_modelnet40_latency(args.iters)
    if not args.quick:
        detail["cagq_vs_fps"] = bench_cagq_vs_fps(args.iters)
        detail["train_step"] = bench_train_step(args.iters)
        detail["spatial_train_step"] = bench_spatial_train_step(args.iters)
    print(json.dumps(detail), file=sys.stderr)

    result = {
        "metric": "points/sec/chip (ScanNet whole-scene seg inference, "
                  f"{seg['scene_points']} pts/scene, "
                  f"{seg['scene']} scene)",
        "value": round(seg["points_per_sec"], 1),
        "unit": "points/sec",
        "vs_baseline": round(seg["points_per_sec"] / BASELINE_POINTS_PER_SEC,
                             4),
        **({"busy_ms": round(seg["busy_ms"], 3)}
           if seg.get("busy_ms") else {}),
        **({"mfu": round(seg["mfu"], 5)} if seg.get("mfu") else {}),
        **({"composite_floor_ms": round(seg["composite_floor_ms"], 3),
            "floor_frac": round(seg["floor_frac"], 4)}
           if seg.get("floor_frac") else {}),
        **({"train_step_ms": round(detail["train_step"]["step_ms"], 2)}
           if "train_step" in detail else {}),
        **({"spatial_train_step_ms":
            round(detail["spatial_train_step"]["step_ms"], 2)}
           if "spatial_train_step" in detail else {}),
        **({"cagq_vs_fps_speedup": round(detail["cagq_vs_fps"]["speedup"], 1)}
           if "cagq_vs_fps" in detail else {}),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

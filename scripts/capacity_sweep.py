"""Layer-0 capacity budget vs accuracy (VERDICT r2 #5, design.md §12).

The <5% layer-0 dropped-point budget has so far been a LATENCY-side
budget (check_capacity asserts it; BASELINE.md records the +0.6 ms cost
of raising nv) with no accuracy evidence. This sweep trains the
`synthetic_scene_seg` preset (labeled surface scenes — realistic skewed
density) at layer-0 nv in {8, 16, 20, 32} and at the preset's resolution
+/- one step, and reports, per point: layer-0 dropped_frac, held-out
mIoU/OA, and the forward latency — so the budget is justified (or
re-tuned) from data.

Usage: python scripts/capacity_sweep.py [--epochs 12] [--quick]
"""

import argparse
import dataclasses
import json
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_point(base, nv: int, resolution: int, epochs: int):
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.data.pipeline import make_dataset
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.ops.voxelize import build_voxel_table, capacity_stats
    from gridgcn_tpu.train.train import train

    l0 = dataclasses.replace(base.model.layers[0], nv=nv,
                             resolution=resolution)
    cfg = dataclasses.replace(
        base,
        name=f"capsweep_nv{nv}_r{resolution}",
        model=dataclasses.replace(base.model,
                                  layers=(l0,) + base.model.layers[1:]))
    cfg = apply_overrides(cfg, {
        "train.epochs": epochs,
        "train.eval_every": epochs,          # final eval only
        "train.ckpt_every": epochs,
        "train.ckpt_dir": tempfile.mkdtemp(prefix=f"capsweep_{nv}_"),
    })

    # measured layer-0 drop fraction on the eval split (capacity_stats)
    ds = make_dataset(cfg.data, "test", cfg.model.num_classes, "seg")
    xyz = jnp.asarray(ds.points[: cfg.data.batch_size])
    mask = jnp.ones(xyz.shape[:2], bool)
    table = build_voxel_table(xyz, mask, resolution, nv,
                              jax.random.PRNGKey(0))
    dropped = float(jnp.max(capacity_stats(table)["dropped_frac"]))

    log = tempfile.mktemp(suffix=".jsonl")
    train(cfg, log_path=log)
    final = None
    with open(log) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "eval":
                final = rec

    # forward latency at the eval batch shape (bench scalar-fetch protocol)
    model, variables = init_model(cfg)
    fwd = jax.jit(lambda v, x, m, k: model.apply(
        v, x, None, m, train=False, rngs={"cagq": k}).sum())
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        float(fwd(variables, xyz, mask, key))
    t0 = time.perf_counter()
    out = None
    for _ in range(20):
        out = fwd(variables, xyz, mask, key)
    float(out)
    lat_ms = (time.perf_counter() - t0) / 20 * 1e3

    row = {"nv": nv, "resolution": resolution, "dropped_frac": dropped,
           "miou": final["miou"], "overall_acc": final["overall_acc"],
           "fwd_ms_batch": lat_ms}
    print("CAPSWEEP " + json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--quick", action="store_true",
                    help="nv sweep only, skip the resolution arm")
    ap.add_argument("--preset", default="synthetic_scene_seg",
                    help="any seg preset — rerun the sweep on real data "
                         "once datasets are mounted (design.md §12 caveat)")
    args = ap.parse_args()

    from gridgcn_tpu.configs import presets
    base = presets.get(args.preset)
    r0 = base.model.layers[0].resolution

    rows = []
    for nv in (8, 16, 20, 32):
        rows.append(run_point(base, nv, r0, args.epochs))
    if not args.quick:
        nv0 = base.model.layers[0].nv
        for res in (r0 // 2, r0 * 2):
            rows.append(run_point(base, nv0, res, args.epochs))
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()

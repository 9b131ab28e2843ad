"""F-16: evaluation driver CLI (SURVEY.md §2.3, §3.5).

    python -m gridgcn_tpu.train.evaluate --ckpt-dir checkpoints [--latency]

Restores the latest checkpoint (config travels with it), runs the eval split
through the confusion-matrix accumulator, and reports OA / mean-class-acc /
mIoU. `--latency` additionally times the synced forward pass (the reference's
latency-table protocol, F-18 lives in bench.py for the headline metric).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from gridgcn_tpu.configs.base import to_json
from gridgcn_tpu.data.pipeline import make_dataset
from gridgcn_tpu.models.build import init_model
from gridgcn_tpu.train.metrics import summarize_confusion
from gridgcn_tpu.train.steps import create_train_state, make_eval_step
from gridgcn_tpu.utils.checkpoint import CheckpointManager
from gridgcn_tpu.utils.logging import MetricLogger


def evaluate(ckpt_dir: str, latency: bool = False, votes: int = 1,
             log_path=None):
    cfg = CheckpointManager.load_config(ckpt_dir)
    log = MetricLogger(log_path)
    log.log("config", name=cfg.name, config=to_json(cfg))

    model, variables = init_model(cfg, seed=cfg.train.seed)
    state = create_train_state(cfg, model, variables, steps_per_epoch=1)
    ckpt = CheckpointManager(ckpt_dir, cfg, keep=cfg.train.keep_ckpts)
    restored = ckpt.restore(state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    state = restored["state"]

    val_ds = make_dataset(cfg.data, "test", cfg.model.num_classes,
                          cfg.model.task)
    if votes > 1:
        from gridgcn_tpu.train.steps import make_voting_eval_step
        eval_step = make_voting_eval_step(cfg, model, votes)
    else:
        eval_step = make_eval_step(cfg, model)
    rng = jax.random.PRNGKey(0)

    cm = jnp.zeros((cfg.model.num_classes, cfg.model.num_classes), jnp.int32)
    t0, n_batches = time.time(), 0
    for batch in val_ds.batches(cfg.data.eval_batch_size, seed=0,
                                shuffle=False, drop_last=False):
        cm = cm + eval_step(state, {k: jax.device_put(v)
                                    for k, v in batch.items()}, rng)
        n_batches += 1
    cm.block_until_ready()
    s = summarize_confusion(cm)
    log.log("eval", step=int(state.step), votes=votes,
            overall_acc=float(s["overall_acc"]),
            mean_class_acc=float(s["mean_class_acc"]),
            miou=float(s["miou"]),
            iou_per_class=[round(float(x), 4) for x in s["iou_per_class"]],
            wall_s=round(time.time() - t0, 3))

    if latency:
        from gridgcn_tpu.utils.profiling import steady_state_time
        batch = next(val_ds.batches(cfg.data.eval_batch_size, seed=0,
                                    shuffle=False))
        dev = {k: jax.device_put(v) for k, v in batch.items()}
        timed = jax.jit(lambda s, b, r: eval_step(s, b, r).sum())
        dt = steady_state_time(timed, state, dev, rng, iters=20)
        log.log("latency", batch_ms=round(dt * 1000, 3),
                points_per_sec=cfg.data.eval_batch_size
                * cfg.data.num_points / dt)
    log.close()
    return s


def evaluate_whole_scenes(ckpt_dir: str, votes: int = 3, mesh_devices: int = 0,
                          resident: bool = False, resident_ml: bool = False,
                          log_path=None, voxel_size: float = 0.05,
                          scene_batch: int = 0):
    """Whole-scene segmentation eval (SURVEY §3.4): every scene is fed at
    full size (optionally spatially sharded across the mesh) `votes` times
    with different CAGQ keys; per-point logits are averaged (the reference's
    block-merging/voting protocol) before the confusion matrix.

    `scene_batch` B > 1 (requires --resident-ml and B | mesh_devices)
    evaluates B scenes CONCURRENTLY on a 2-D (scene × slab) mesh — the
    F-19 ∘ F-22 composition (VERDICT r4 #7): each scene's voxel slabs ride
    its own (mesh_devices / B)-chip spatial ring. Outputs match the
    per-scene path (test_scene_batched_tier3_matches_per_scene)."""
    import numpy as np

    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.spatial import required_halo, sharded_scene_apply

    cfg = CheckpointManager.load_config(ckpt_dir)
    if cfg.model.task != "seg":
        raise ValueError("whole-scene eval is a segmentation protocol")
    log = MetricLogger(log_path)

    model, variables = init_model(cfg, seed=cfg.train.seed)
    state = create_train_state(cfg, model, variables, steps_per_epoch=1)
    ckpt = CheckpointManager(ckpt_dir, cfg, keep=cfg.train.keep_ckpts)
    restored = ckpt.restore(state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    state = restored["state"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    val_ds = make_dataset(cfg.data, "test", cfg.model.num_classes,
                          cfg.model.task)
    mesh = make_mesh(mesh_devices) if mesh_devices else None

    cm = jnp.zeros((cfg.model.num_classes, cfg.model.num_classes), jnp.int32)
    vox_cm = np.zeros((cfg.model.num_classes, cfg.model.num_classes),
                      np.int64)
    from gridgcn_tpu.train.metrics import confusion_matrix, voxel_confusion

    fwd = jax.jit(lambda x, f, m, k: model.apply(
        variables, x, f, m, train=False, rngs={"cagq": k}))
    fwd_resident = None
    if (resident or resident_ml) and mesh is None:
        raise ValueError("--resident/--resident-ml require --mesh N (a "
                         "device mesh to shard over)")
    if resident_ml:
        from gridgcn_tpu.parallel.resident_ml import (
            make_resident_ml_forward, resident_ml_seg_predict)
        fwd_resident = make_resident_ml_forward(cfg, mesh)
        predict_resident = resident_ml_seg_predict
    elif resident:
        from gridgcn_tpu.parallel.resident import (
            make_resident_forward, resident_seg_predict)
        fwd_resident = make_resident_forward(cfg, mesh)
        predict_resident = resident_seg_predict

    from gridgcn_tpu.parallel.spatial import suggest_capacity

    def metric_mask_for(labels, mask):
        # metric mask only — the forward still sees every point; the
        # reference ScanNet protocol scores annotated points/voxels only
        return (mask & (labels != cfg.model.ignore_label)
                if cfg.model.ignore_label is not None else mask)

    if scene_batch and scene_batch > 1:
        if not resident_ml:
            raise ValueError("--scene-batch requires --resident-ml")
        if mesh_devices % scene_batch:
            raise ValueError(f"--scene-batch {scene_batch} must divide "
                             f"--mesh {mesh_devices}")
        from gridgcn_tpu.parallel.mesh import (
            DATA_AXIS, SPACE_AXIS, make_mesh2d)
        from gridgcn_tpu.parallel.resident_ml import (
            resident_ml_seg_predict_scenes)

        mesh2d = make_mesh2d(scene_batch, mesh_devices // scene_batch)
        fwd2 = make_resident_ml_forward(cfg, mesh2d, axis_name=SPACE_AXIS,
                                        batch_axis=DATA_AXIS)
        S = val_ds.size
        for g0 in range(0, S, scene_batch):
            grp = list(range(g0, min(g0 + scene_batch, S)))
            grp_p = grp + [grp[0]] * (scene_batch - len(grp))
            xyzs = np.stack([val_ds.points[i] for i in grp_p])
            labs = [val_ds.labels[i] for i in grp]
            feats = (np.stack([val_ds.features[i] for i in grp_p])
                     if val_ds.features is not None else None)
            masks = np.ones(xyzs.shape[:2], bool)
            acc = None
            for v in range(votes):
                lg = resident_ml_seg_predict_scenes(
                    cfg, variables, xyzs, masks, mesh2d,
                    rng=jax.random.PRNGKey(1000 * g0 + v),
                    feats=feats, fwd=fwd2)
                acc = lg if acc is None else acc + lg
            for j, i in enumerate(grp):
                mm = metric_mask_for(labs[j], masks[j])
                cm = cm + confusion_matrix(
                    jnp.asarray(acc[j])[None], jnp.asarray(labs[j])[None],
                    cfg.model.num_classes, jnp.asarray(mm)[None])
                vox_cm = vox_cm + voxel_confusion(
                    xyzs[j], acc[j], labs[j], mm, voxel_size,
                    cfg.model.num_classes)
        s_ = summarize_confusion(cm)
        sv = summarize_confusion(jnp.asarray(vox_cm, jnp.float32))
        s_["voxel_acc"] = sv["overall_acc"]
        log.log("whole_scene_eval", scenes=S, votes=votes,
                scene_batch=scene_batch,
                overall_acc=float(s_["overall_acc"]),
                mean_class_acc=float(s_["mean_class_acc"]),
                miou=float(s_["miou"]),
                voxel_size=voxel_size,
                voxel_acc=float(sv["overall_acc"]))
        log.close()
        return s_

    for s in range(val_ds.size):
        xyz = val_ds.points[s]
        labels = val_ds.labels[s]
        feat = (val_ds.features[s]
                if val_ds.features is not None else None)
        mask = np.ones(xyz.shape[0], bool)
        metric_mask = metric_mask_for(labels, mask)
        if fwd_resident is not None:
            # votes ride inside predict_resident (fold_in per vote), so
            # partitioning and parameter staging happen once per scene
            acc_logits = votes * predict_resident(
                cfg, variables, xyz, mask, mesh,
                rng=jax.random.PRNGKey(1000 * s), fwd=fwd_resident,
                votes=votes, feat=feat)
        else:
            if mesh is not None:   # vote-invariant partition geometry
                halo = required_halo(cfg, float(np.ptp(xyz, axis=0).max()))
                capacity = suggest_capacity(xyz, mask, mesh.devices.size,
                                            halo)
            acc_logits = None
            for v in range(votes):
                key = jax.random.PRNGKey(1000 * s + v)
                if mesh is not None:
                    apply_fn = ((lambda x, f, m: fwd(x, f, m, key))
                                if feat is not None else
                                (lambda x, m: fwd(x, None, m, key)))
                    logits = sharded_scene_apply(
                        apply_fn, xyz, mask, mesh,
                        halo=halo, capacity=capacity,
                        num_outputs=cfg.model.num_classes, feat=feat)
                else:
                    fb = feat[None] if feat is not None else None
                    logits = np.asarray(fwd(xyz[None], fb, mask[None],
                                            key))[0]
                acc_logits = (logits if acc_logits is None
                              else acc_logits + logits)
        cm = cm + confusion_matrix(
            jnp.asarray(acc_logits)[None], jnp.asarray(labels)[None],
            cfg.model.num_classes, jnp.asarray(metric_mask)[None])
        # reference ScanNet metric: per-VOXEL accuracy (predictions
        # projected onto a voxel grid, one vote per occupied voxel)
        vox_cm = vox_cm + voxel_confusion(
            xyz, acc_logits, labels, metric_mask, voxel_size,
            cfg.model.num_classes)
    s_ = summarize_confusion(cm)
    sv = summarize_confusion(jnp.asarray(vox_cm, jnp.float32))
    s_["voxel_acc"] = sv["overall_acc"]
    log.log("whole_scene_eval", scenes=val_ds.size, votes=votes,
            overall_acc=float(s_["overall_acc"]),
            mean_class_acc=float(s_["mean_class_acc"]),
            miou=float(s_["miou"]),
            voxel_size=voxel_size,
            voxel_acc=float(sv["overall_acc"]))
    log.close()
    return s_


def evaluate_s3dis_rooms(ckpt_dir: str, votes: int = 1, log_path=None,
                         quant: float = 1e-3):
    """S3DIS room-level evaluation (SURVEY §2.3 F-16 'whole-scene evaluation
    by block-merging'): every test block is forwarded, block logits are
    merged back into whole rooms by quantized room-frame position (feats
    cols 3:6 carry normalized room xyz — the PointNet-lineage layout,
    data/s3dis.py), with logit voting where blocks overlap, and mIoU is
    scored over merged room points."""
    import numpy as np

    from gridgcn_tpu.data.s3dis import load_s3dis_rooms
    from gridgcn_tpu.train.metrics import merge_block_logits

    cfg = CheckpointManager.load_config(ckpt_dir)
    if cfg.model.task != "seg":
        raise ValueError("room-level eval is a segmentation protocol")
    log = MetricLogger(log_path)

    model, variables = init_model(cfg, seed=cfg.train.seed)
    state = create_train_state(cfg, model, variables, steps_per_epoch=1)
    ckpt = CheckpointManager(ckpt_dir, cfg, keep=cfg.train.keep_ckpts)
    restored = ckpt.restore(state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    state = restored["state"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    xyz, feats, labels, room_ids, names = load_s3dis_rooms(
        cfg.data.root, "test", cfg.data.num_points,
        holdout=cfg.data.s3dis_holdout)
    C = cfg.model.num_classes
    fwd = jax.jit(lambda x, f, m, k: model.apply(
        variables, x, f, m, train=False, rngs={"cagq": k}))

    cm = jnp.zeros((C, C), jnp.int32)
    B = cfg.data.eval_batch_size
    from gridgcn_tpu.train.metrics import confusion_matrix
    for r in range(len(names)):
        sel = np.nonzero(room_ids == r)[0]
        blk_logits = np.zeros((len(sel), xyz.shape[1], C), np.float32)
        for i0 in range(0, len(sel), B):
            idx = sel[i0:i0 + B]
            pad = B - len(idx)
            bx = np.concatenate([xyz[idx], np.zeros((pad, *xyz.shape[1:]),
                                                    xyz.dtype)])
            bf = np.concatenate([feats[idx],
                                 np.zeros((pad, *feats.shape[1:]),
                                          feats.dtype)])
            bm = np.ones((B, xyz.shape[1]), bool)
            acc = None
            for v in range(votes):
                lg = np.asarray(fwd(bx, bf, bm,
                                    jax.random.PRNGKey(1000 * r + v)))
                acc = lg if acc is None else acc + lg
            blk_logits[i0:i0 + len(idx)] = acc[:len(idx)]
        # merge on normalized room xyz (feature cols 3:6)
        pos = feats[sel][..., 3:6]
        masks = np.ones(pos.shape[:2], bool)
        merged, first = merge_block_logits(pos, blk_logits, masks,
                                           quant=quant)
        room_labels = labels[sel].reshape(-1)[first]
        cm = cm + confusion_matrix(
            jnp.asarray(merged)[None], jnp.asarray(room_labels)[None], C,
            jnp.ones((1, len(merged)), bool))
    s_ = summarize_confusion(cm)
    log.log("s3dis_room_eval", rooms=len(names), votes=votes,
            overall_acc=float(s_["overall_acc"]),
            mean_class_acc=float(s_["mean_class_acc"]),
            miou=float(s_["miou"]),
            iou_per_class=[round(float(x), 4)
                           for x in s_["iou_per_class"]])
    log.close()
    return s_


def main(argv=None):
    from gridgcn_tpu.parallel.mesh import maybe_init_distributed
    from gridgcn_tpu.utils.platform import force_platform_from_env

    force_platform_from_env()
    # multi-host launch (coordinator env set): the sharded eval paths run
    # on the global mesh — the predict drivers fetch via fetch_global
    maybe_init_distributed()
    p = argparse.ArgumentParser(description="gridgcn_tpu evaluator")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--latency", action="store_true")
    p.add_argument("--whole-scene", action="store_true",
                   help="full-scene seg eval with logit voting")
    p.add_argument("--s3dis-rooms", action="store_true",
                   help="S3DIS room-level block-merging eval (mIoU over "
                        "rooms reassembled from blocks)")
    p.add_argument("--voxel-size", type=float, default=0.05,
                   help="whole-scene: grid size for the per-voxel accuracy "
                        "metric (ScanNet protocol)")
    p.add_argument("--votes", type=int, default=None,
                   help="whole-scene: CAGQ-seed voting rounds (default 3); "
                        "standard eval: up-axis rotation-voting rounds "
                        "(default 1)")
    p.add_argument("--mesh", type=int, default=0,
                   help="spatially shard each scene over N devices")
    p.add_argument("--resident", action="store_true",
                   help="with --mesh: fully-resident sharding (dense level "
                        "sharded, coarse pyramid replicated after one "
                        "all_gather) instead of per-slab re-runs")
    p.add_argument("--resident-ml", action="store_true",
                   help="with --mesh: multi-layer feature-halo sharding — "
                        "EVERY pyramid level stays sharded; boundary halos "
                        "ride ppermute between layers (F-22 tier 3)")
    p.add_argument("--scene-batch", type=int, default=0,
                   help="with --mesh N --resident-ml: evaluate B scenes "
                        "concurrently on a 2-D (scene x slab) mesh — B "
                        "scene rows x N/B spatial shards (B must divide N)")
    p.add_argument("--log", default=None)
    p.add_argument("--target", default=None,
                   choices=["modelnet40", "s3dis", "scannet"],
                   help="parity gate: compare the protocol's metric against "
                        "the reference's published number "
                        "(gridgcn_tpu/train/accuracy_targets.json) and exit "
                        "nonzero below it")
    args = p.parse_args(argv)
    if args.votes is not None and args.votes < 1:
        p.error(f"--votes must be >= 1, got {args.votes}")
    if args.s3dis_rooms:
        s = evaluate_s3dis_rooms(args.ckpt_dir,
                                 votes=1 if args.votes is None else args.votes,
                                 log_path=args.log)
    elif args.whole_scene:
        s = evaluate_whole_scenes(args.ckpt_dir,
                                  votes=3 if args.votes is None else args.votes,
                                  mesh_devices=args.mesh,
                                  resident=args.resident,
                                  resident_ml=args.resident_ml,
                                  log_path=args.log,
                                  voxel_size=args.voxel_size,
                                  scene_batch=args.scene_batch)
    else:
        s = evaluate(args.ckpt_dir, latency=args.latency,
                     votes=1 if args.votes is None else args.votes,
                     log_path=args.log)
    if args.target:
        check_target(args.target, s)


def check_target(name: str, summary: dict):
    """Reference-parity gate (VERDICT r1 next-round #5): compares the
    protocol's metric against the published target recorded in
    gridgcn_tpu/train/accuracy_targets.json (shipped as package data, so
    the gate works from an installed wheel too) and exits nonzero when
    below it — 'data mounted' → 'parity verified' is one evaluate command."""
    import json
    import os
    import sys

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "accuracy_targets.json")
    spec = json.load(open(path))[name]
    metric, target = spec["metric"], float(spec["target"])
    if metric not in summary:
        print(f"PARITY {name}: metric '{metric}' not produced by this "
              f"protocol — run the protocol in accuracy_targets.json: "
              f"{spec.get('protocol')}", file=sys.stderr)
        raise SystemExit(2)
    value = float(summary[metric])
    ok = value >= target
    print(f"PARITY {name}: {metric}={value:.4f} "
          f"{'>=' if ok else '<'} target {target:.4f} → "
          f"{'PASS' if ok else 'FAIL'}")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

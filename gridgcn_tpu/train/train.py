"""F-15: training driver CLI (SURVEY.md §2.3, §3.1).

    python -m gridgcn_tpu.train.train --preset modelnet40_full \
        [--mesh N] [--epochs-override ...] [key=value ...]

One CLI for every task (the reference has one script per task); the config
preset decides classification vs segmentation. Checkpoints via orbax with
auto-restore-latest; metrics as JSONL lines.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.configs import presets
from gridgcn_tpu.configs.base import (
    Config, apply_overrides, parse_cli_overrides, to_json)
from gridgcn_tpu.data.pipeline import make_dataset
from gridgcn_tpu.models.build import init_model
from gridgcn_tpu.parallel.mesh import (
    DATA_AXIS, make_mesh, maybe_init_distributed, shard_batch)
from gridgcn_tpu.parallel.dp import make_parallel_eval_step, make_parallel_train_step
from gridgcn_tpu.train.metrics import summarize_confusion
from gridgcn_tpu.train.steps import (
    create_train_state, make_eval_step, make_optimizer, make_train_step)
from gridgcn_tpu.utils.checkpoint import CheckpointManager
from gridgcn_tpu.utils.logging import MetricLogger


def _log_capacity(log: MetricLogger, cfg: Config, ds,
                  auto_capacity: str = "off") -> Config:
    """One-time layer-0 capacity audit on the mounted training data (real
    datasets have different occupancy skew than the synthetic presets were
    sized on); warns loudly when the configured nv over-drops (VERDICT r2
    next-round #9).

    `auto_capacity` closes the loop (VERDICT r3 #8): 'propose' logs the
    smallest (nv, resolution) bump that fits the budget (the design.md §12
    sweep justifies nv bumps as accuracy-neutral); 'apply' additionally
    returns the updated config — real-data onboarding stays one command.
    Returns the (possibly updated) config either way."""
    from gridgcn_tpu.utils.debug import audit_layer0_capacity

    report = audit_layer0_capacity(cfg, ds.points)
    log.log("capacity", **report)
    if not report["over_budget"]:
        return cfg
    if auto_capacity in ("propose", "apply"):
        import dataclasses

        from gridgcn_tpu.utils.debug import propose_layer0_capacity

        prop = propose_layer0_capacity(cfg, ds.points,
                                       budget=report["budget"])
        log.log("capacity_proposal",
                applied=(auto_capacity == "apply" and prop["within_budget"]),
                **prop)
        if auto_capacity == "apply" and prop["within_budget"]:
            l0 = dataclasses.replace(cfg.model.layers[0], nv=prop["nv"],
                                     resolution=prop["resolution"])
            return dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, layers=(l0,) + cfg.model.layers[1:]))
        return cfg
    import warnings
    warnings.warn(
        f"layer-0 voxel table drops {report['dropped_frac']:.1%} of "
        f"points on this dataset (> {report['budget']:.0%} budget); "
        f"raise layers[0].nv (={report['nv']}) or resolution "
        f"(={report['resolution']}) — see design.md §12 for the "
        f"accuracy/latency trade, or rerun with --auto-capacity apply",
        RuntimeWarning, stacklevel=2)
    return cfg


def train(cfg: Config, mesh_devices: int = 0, log_path: str | None = None,
          tensorboard_dir: str | None = None, auto_capacity: str = "off"):
    log = MetricLogger(log_path, tensorboard_dir=tensorboard_dir)
    log.log("config", name=cfg.name, config=to_json(cfg))

    train_ds = make_dataset(cfg.data, "train", cfg.model.num_classes,
                            cfg.model.task)
    val_ds = make_dataset(cfg.data, "test", cfg.model.num_classes,
                          cfg.model.task)
    steps_per_epoch = (cfg.train.steps_per_epoch
                       or train_ds.steps_per_epoch(cfg.data.batch_size))
    cfg = _log_capacity(log, cfg, train_ds, auto_capacity)

    model, variables = init_model(cfg, seed=cfg.train.seed)
    state = create_train_state(cfg, model, variables, steps_per_epoch)
    _, sched = make_optimizer(cfg, steps_per_epoch)

    class_weights = None
    if cfg.train.class_weighting and cfg.model.task == "seg":
        from gridgcn_tpu.train.steps import class_weights_from_dataset
        class_weights = class_weights_from_dataset(
            train_ds.labels, cfg.model.num_classes,
            ignore_label=cfg.model.ignore_label)

    mesh = make_mesh(mesh_devices) if mesh_devices else None
    if mesh is not None:
        train_step = make_parallel_train_step(cfg, model, mesh, sched,
                                              class_weights=class_weights)
        eval_step = make_parallel_eval_step(cfg, model, mesh)
    else:
        train_step = make_train_step(cfg, model, sched,
                                     class_weights=class_weights)
        eval_step = make_eval_step(cfg, model)

    ckpt = CheckpointManager(cfg.train.ckpt_dir, cfg, keep=cfg.train.keep_ckpts)
    rng = jax.random.PRNGKey(cfg.train.seed)
    restored = ckpt.restore(state, rng)
    start_epoch = 0
    if restored is not None:
        state, rng = restored["state"], restored.get("rng", rng)
        start_epoch = int(state.step) // steps_per_epoch
        log.log("restore", step=int(state.step), epoch=start_epoch)

    def put(batch):
        return shard_batch(batch, mesh) if mesh is not None else {
            k: jax.device_put(v) for k, v in batch.items()}

    from gridgcn_tpu.data.pipeline import Prefetcher

    for epoch in range(start_epoch, cfg.train.epochs):
        t_ep = time.time()
        losses, accs = [], []
        # background host-side assembly + device staging overlaps the steps
        for batch in Prefetcher(
                train_ds.batches(cfg.data.batch_size,
                                 seed=cfg.train.seed + epoch), put):
            state, m = train_step(state, batch, rng)
            losses.append(m["loss"])
            accs.append(m["acc"])
            if (cfg.train.log_every > 0
                    and int(state.step) % cfg.train.log_every == 0):
                log.log("train_step", step=int(state.step),
                        loss=float(m["loss"]), acc=float(m["acc"]),
                        lr=float(m.get("lr", cfg.train.lr)),
                        grad_norm=float(m["grad_norm"]))
        pts_per_sec = (steps_per_epoch * cfg.data.batch_size
                       * cfg.data.num_points) / max(time.time() - t_ep, 1e-9)
        log.log("epoch", epoch=epoch,
                loss=float(np.mean(jax.device_get(losses))),
                acc=float(np.mean(jax.device_get(accs))),
                points_per_sec=pts_per_sec)

        if cfg.train.eval_every > 0 and (
                (epoch + 1) % cfg.train.eval_every == 0
                or epoch == cfg.train.epochs - 1):
            cm = jnp.zeros((cfg.model.num_classes, cfg.model.num_classes),
                           jnp.int32)
            ek = jax.random.PRNGKey(10_000 + epoch)
            for batch in val_ds.batches(cfg.data.eval_batch_size,
                                        seed=0, shuffle=False,
                                        drop_last=False):
                cm = cm + eval_step(state, put(batch), ek)
            s = summarize_confusion(cm)
            log.log("eval", epoch=epoch,
                    overall_acc=float(s["overall_acc"]),
                    mean_class_acc=float(s["mean_class_acc"]),
                    miou=float(s["miou"]))

        if (cfg.train.ckpt_every > 0 and (epoch + 1) % cfg.train.ckpt_every == 0) \
                or epoch == cfg.train.epochs - 1:
            ckpt.save(int(state.step), jax.device_get(state),
                      jax.device_get(rng))
    ckpt.wait()
    log.close()
    return state


def train_spatial(cfg: Config, mesh_devices: int,
                  log_path: str | None = None, capacity: int = 0,
                  tier: str = "resident",
                  tensorboard_dir: str | None = None,
                  ghost_cap="0", auto_capacity: str = "off",
                  scene_batch: int = 0):
    """Fully-resident spatially-sharded training (F-22): each training
    example is ONE whole scene partitioned into slabs across the mesh; the
    loss is owned-point-masked CE; gradients psum over ICI (see
    parallel/spatial_train.py). Augmentation (cfg.data.augment, F-14 —
    the same jitted `augment_batch` op set the crop-DP step runs) is
    applied to the WHOLE scene before partitioning, so the rotation
    precedes the slab cut and grid bounds follow the rotated cloud;
    dropout rides the mask into `partition_scene`.

    `scene_batch` B > 1 (tier resident_ml, B | mesh_devices) composes
    scene-batch DP with the spatial sharding on a 2-D (B scenes ×
    mesh_devices/B slabs) mesh: B whole scenes per optimizer step, each
    sharded over its own spatial ring, gradients pooled across scenes
    (parallel/spatial_train.shard_scene_batches)."""
    from gridgcn_tpu.data.augment import augment_batch
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batch, shard_scene_batches)

    if cfg.model.task != "seg":
        raise ValueError("--spatial training is a segmentation protocol")
    if scene_batch and scene_batch > 1:
        if tier != "resident_ml":
            raise ValueError("--scene-batch spatial training is a tier-3 "
                             "(resident-ml) protocol")
        if mesh_devices % scene_batch:
            raise ValueError(f"--scene-batch {scene_batch} must divide "
                             f"--mesh {mesh_devices}")
    else:
        scene_batch = 0
    log = MetricLogger(log_path, tensorboard_dir=tensorboard_dir)
    log.log("config", name=cfg.name, config=to_json(cfg), spatial=True)

    train_ds = make_dataset(cfg.data, "train", cfg.model.num_classes,
                            cfg.model.task)
    cfg = _log_capacity(log, cfg, train_ds, auto_capacity)
    steps_per_epoch = cfg.train.steps_per_epoch or train_ds.size
    model, variables = init_model(cfg, seed=cfg.train.seed)
    state = create_train_state(cfg, model, variables, steps_per_epoch)
    _, sched = make_optimizer(cfg, steps_per_epoch)
    if scene_batch:
        from gridgcn_tpu.parallel.mesh import make_mesh2d
        mesh = make_mesh2d(scene_batch, mesh_devices // scene_batch)
        D = mesh_devices // scene_batch   # spatial shards per scene ring
    else:
        mesh = make_mesh(mesh_devices)
        D = mesh_devices
    N = cfg.data.num_points
    if not capacity:
        # tier-2 halo is thin (finest-grid reach), so 2×share + rounding
        # headroom holds typical scenes; a denser slab falls back to N
        capacity = min(N, ((2 * N // D + 255) // 256) * 256)

    class_weights = None
    if cfg.train.class_weighting:
        from gridgcn_tpu.train.steps import class_weights_from_dataset
        class_weights = class_weights_from_dataset(
            train_ds.labels, cfg.model.num_classes,
            ignore_label=cfg.model.ignore_label)

    # tier-3 ghost caps: "auto" calibrates per-level buffers from a sample
    # of training scenes (worst case over the sample — the compiled step is
    # shared by every scene), shrinking the ghost-compute tax vs the
    # full-share default (design.md §13 addendum)
    caps = 0
    if str(ghost_cap) == "auto" and tier == "resident_ml":
        from gridgcn_tpu.parallel.resident_ml import calibrate_ghost_cap
        per_scene = [calibrate_ghost_cap(cfg, train_ds.points[i],
                                         np.ones(N, bool), D)
                     for i in range(min(train_ds.size, 8))]
        caps = tuple(int(max(c)) for c in zip(*per_scene))
        log.log("ghost_cap", caps=list(caps))
    elif str(ghost_cap) not in ("0", "auto"):
        caps = int(ghost_cap)
    step = make_spatial_train_step(cfg, mesh, sched, tier=tier,
                                   class_weights=class_weights,
                                   ghost_cap=caps,
                                   batch_axis=(DATA_AXIS if scene_batch
                                               else None))
    ckpt = CheckpointManager(cfg.train.ckpt_dir, cfg, keep=cfg.train.keep_ckpts)
    rng = jax.random.PRNGKey(cfg.train.seed)
    restored = ckpt.restore(state, rng)
    start_epoch = 0
    # optimizer steps per epoch: one per scene, or one per scene GROUP
    # when scene-batched (drop-last grouping below)
    opt_steps_per_epoch = (train_ds.size // scene_batch if scene_batch
                           else train_ds.size)
    if restored is not None:
        state, rng = restored["state"], restored.get("rng", rng)
        start_epoch = int(state.step) // max(opt_steps_per_epoch, 1)
        log.log("restore", step=int(state.step), epoch=start_epoch)

    mask_full = np.ones(N, bool)
    aug_fn = None
    if cfg.data.augment:
        # pin the pre-partition augment to the HOST CPU device: its output
        # feeds host-side partition_scene immediately, so running it on the
        # accelerator would buy three tunnel roundtrips per step (measured
        # 80k -> 48k pts/s on the scene loop) for zero benefit. Placement
        # via jax.default_device around the call — numpy inputs are
        # uncommitted, so the jitted computation lands on that device.
        try:
            _aug_dev = jax.devices("cpu")[0]
        except RuntimeError:
            import warnings
            warnings.warn(
                "no CPU backend available (JAX_PLATFORMS pins the "
                "accelerator only): pre-partition augmentation runs on the "
                "accelerator, which costs ~40% scene-loop throughput on "
                "tunneled backends (three extra roundtrips per step)",
                RuntimeWarning, stacklevel=2)
            _aug_dev = None
        _seed0 = int(cfg.train.seed) + 71_717

        def _aug_key(e, g):
            return jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(_seed0), e), g)

        if train_ds.features is not None:
            _aug_jit = jax.jit(lambda x, m, e, g, f: augment_batch(
                x, m, _aug_key(e, g), cfg.data, f))
        else:
            _aug_jit = jax.jit(lambda x, m, e, g: augment_batch(
                x, m, _aug_key(e, g), cfg.data))

        def aug_fn(*a):
            if _aug_dev is None:
                return _aug_jit(*a)
            with jax.default_device(_aug_dev):
                return _aug_jit(*a)
    for epoch in range(start_epoch, cfg.train.epochs):
        t_ep = time.time()
        losses, accs, overflows = [], [], []
        order = np.random.default_rng(cfg.train.seed + epoch).permutation(
            train_ds.size)
        if scene_batch:
            # B whole scenes per step (drop-last, standard DP grouping)
            groups = [order[i:i + scene_batch]
                      for i in range(0, len(order) - scene_batch + 1,
                                     scene_batch)]
        else:
            groups = [[s_i] for s_i in order]
        for grp in groups:
            if scene_batch or aug_fn is not None:
                xyz = np.stack([train_ds.points[i] for i in grp])
                labels = np.stack([train_ds.labels[i] for i in grp])
                feat = (np.stack([train_ds.features[i] for i in grp])
                        if train_ds.features is not None else None)
                masks = np.repeat(mask_full[None], len(grp), 0)
            else:
                # hot default path (per-scene, no augment): pass the
                # dataset arrays by reference, no per-step host copies
                xyz = train_ds.points[grp[0]][None]
                labels = train_ds.labels[grp[0]][None]
                feat = (train_ds.features[grp[0]][None]
                        if train_ds.features is not None else None)
                masks = mask_full[None]
            if aug_fn is not None:
                # F-14 over the WHOLE scene, before partitioning: same
                # jitted op set as the crop-DP step (rotation precedes the
                # slab cut; dropout rides the mask into partition_scene);
                # e/g ride as traced scalars so the key math stays on the
                # augment device and one compile serves every step
                e_g = (np.int32(epoch), np.int32(grp[0]))
                if feat is not None:
                    ax, am, af = aug_fn(xyz, masks, *e_g, feat)
                    feat = np.asarray(af)
                else:
                    ax, am, _ = aug_fn(xyz, masks, *e_g)
                xyz, masks = np.asarray(ax), np.asarray(am)
            if scene_batch:
                try:
                    batch = shard_scene_batches(cfg, xyz, labels, masks,
                                                mesh, capacity, feats=feat)
                except ValueError:   # dense slab overflowed the capacity
                    batch = shard_scene_batches(cfg, xyz, labels, masks,
                                                mesh, N, feats=feat)
            else:
                try:
                    batch = shard_scene_batch(cfg, xyz[0], labels[0],
                                              masks[0], mesh, capacity,
                                              feat=(feat[0] if feat is not
                                                    None else None))
                except ValueError:   # dense slab overflowed the capacity
                    batch = shard_scene_batch(cfg, xyz[0], labels[0],
                                              masks[0], mesh, N,
                                              feat=(feat[0] if feat is not
                                                    None else None))
            state, m = step(state, batch, rng)
            losses.append(m["loss"])
            accs.append(m["acc"])
            if "ghost_overflow" in m:
                overflows.append(m["ghost_overflow"])
            if (cfg.train.log_every > 0
                    and int(state.step) % cfg.train.log_every == 0):
                log.log("train_step", step=int(state.step),
                        loss=float(m["loss"]), acc=float(m["acc"]),
                        grad_norm=float(m["grad_norm"]))
        # verify the calibrated ghost_cap estimate per epoch (summed here,
        # not per step, to keep step dispatch asynchronous): a nonzero
        # count means some scene's boundary band outgrew the caps and the
        # decoder read stale/zero ghosts — quality silently degrades unless
        # the caps are raised (calibrate_ghost_cap docstring contract)
        n_over = int(np.sum(jax.device_get(overflows))) if overflows else 0
        if n_over:
            import warnings
            warnings.warn(
                f"resident-ml training: {n_over} boundary rows overflowed "
                f"the per-face ghost buffers this epoch (ghost_cap="
                f"{caps!r}); raise --ghost-cap or re-run calibration with "
                f"a higher safety factor", RuntimeWarning, stacklevel=2)
        log.log("epoch", epoch=epoch,
                loss=float(np.mean(jax.device_get(losses))),
                acc=float(np.mean(jax.device_get(accs))),
                ghost_overflow=n_over,
                points_per_sec=train_ds.size * N
                / max(time.time() - t_ep, 1e-9))
        if (cfg.train.ckpt_every > 0 and (epoch + 1) % cfg.train.ckpt_every == 0) \
                or epoch == cfg.train.epochs - 1:
            ckpt.save(int(state.step), jax.device_get(state),
                      jax.device_get(rng))
    ckpt.wait()
    log.close()
    return state


def main(argv=None):
    from gridgcn_tpu.utils.platform import force_platform_from_env

    force_platform_from_env()
    p = argparse.ArgumentParser(description="gridgcn_tpu trainer")
    p.add_argument("--preset", default="modelnet40_full",
                   choices=sorted(presets.PRESETS))
    p.add_argument("--mesh", type=int, default=0,
                   help="devices for data-parallel mesh (0 = single device)")
    p.add_argument("--spatial", choices=["resident", "resident-ml"],
                   default=None,
                   help="with --mesh N: fully-resident spatially-sharded "
                        "training — each example is one whole scene "
                        "partitioned across the mesh (F-22)")
    p.add_argument("--spatial-capacity", type=int, default=0,
                   help="per-shard point capacity (0 = auto)")
    p.add_argument("--ghost-cap", default="0",
                   help="tier-3 per-face ghost buffer rows: an int, 0 = "
                        "full-share default, or 'auto' = calibrate from "
                        "the training scenes' boundary occupancy (less "
                        "ghost-compute tax; design.md §13 addendum)")
    p.add_argument("--scene-batch", type=int, default=0,
                   help="with --spatial resident-ml: train B whole scenes "
                        "per step on a 2-D (B scenes x mesh/B slabs) mesh "
                        "(scene-batch DP composed with spatial sharding)")
    p.add_argument("--auto-capacity", choices=["off", "propose", "apply"],
                   default="off",
                   help="step-0 layer-0 capacity audit action when the "
                        "dropped-point budget is exceeded: 'propose' logs "
                        "the smallest (nv, resolution) bump that fits, "
                        "'apply' trains with it (design.md §12)")
    p.add_argument("--log", default=None, help="JSONL metrics file")
    p.add_argument("--tensorboard", default=None, metavar="DIR",
                   help="also write metric scalars as TensorBoard events")
    p.add_argument("overrides", nargs="*",
                   help="config overrides, e.g. train.lr=3e-4")
    args = p.parse_args(argv)

    maybe_init_distributed()
    cfg = presets.get(args.preset)
    if args.overrides:
        cfg = apply_overrides(cfg, parse_cli_overrides(args.overrides))
    if args.spatial:
        if not args.mesh:
            p.error("--spatial requires --mesh N")
        train_spatial(cfg, mesh_devices=args.mesh, log_path=args.log,
                      capacity=args.spatial_capacity,
                      tier=args.spatial.replace("-", "_"),
                      tensorboard_dir=args.tensorboard,
                      ghost_cap=args.ghost_cap,
                      auto_capacity=args.auto_capacity,
                      scene_batch=args.scene_batch)
    else:
        train(cfg, mesh_devices=args.mesh, log_path=args.log,
              tensorboard_dir=args.tensorboard,
              auto_capacity=args.auto_capacity)


if __name__ == "__main__":
    main()

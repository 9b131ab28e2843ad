"""F-22: fully-resident spatially-sharded TRAINING (SURVEY §2.4).

The reference trains on fixed-size crops because one 2019 GPU fit them
(SURVEY §2.3 F-12); its only parallelism is replicated data parallelism
(F-19). The TPU-native extension trains on WHOLE scenes whose dense level
never exists on any single chip: the tier-2 resident forward
(`parallel/resident.py`) runs with BatchNorm in batch mode, the loss is
masked to each shard's OWNED points, and XLA inserts the gradient psum over
ICI because the params are replicated while logits are sharded. BN running
statistics are pmean'd across shards inside the forward (the standard
cross-replica BN approximation of data parallelism).

Scenes are partitioned host-side once per step (`partition_scene`); the
train CLI drives this via `train.py --spatial resident`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gridgcn_tpu.configs.base import Config
from gridgcn_tpu.ops.voxelize import grid_bounds
from gridgcn_tpu.parallel.mesh import DATA_AXIS
from gridgcn_tpu.parallel.resident import make_resident_forward, resident_halo
from gridgcn_tpu.parallel.spatial import partition_scene
from gridgcn_tpu.train.steps import TrainState


def make_spatial_train_step(cfg: Config, mesh: Mesh, sched=None,
                            class_weights: Optional[jax.Array] = None,
                            tier: str = "resident", ghost_cap=0,
                            batch_axis: Optional[str] = None):
    """Jitted (state, scene_batch, rng) → (state, metrics) step over the
    tier-2 (`tier="resident"`) or tier-3 (`tier="resident_ml"`) forward.
    `scene_batch` comes from `shard_scene_batch`: sx [D,cap,3], sm [D,cap],
    owned [D,cap], label [D,cap], plus edges / origin / vsize / extent.
    `ghost_cap` (tier 3): per-face ghost buffer rows, int or per-level
    sequence — calibrated caps shrink the ghost-compute tax
    (`resident_ml.calibrate_ghost_cap`, design.md §13 addendum).

    `batch_axis` (tier 3 only) trains scene-batched on a 2-D
    (`batch_axis`, space) mesh (`mesh.make_mesh2d`): `scene_batch` then
    comes from `shard_scene_batches` with a LEADING scene axis on every
    per-scene array, the loss pools owned points across all scenes, and
    one step's gradient ≡ the pooled per-scene 1-D gradients
    (test_spatial.test_scene_batched_tier3_train_grads_match_per_scene)."""
    if batch_axis is not None and tier != "resident_ml":
        raise ValueError("scene-batched (2-D mesh) spatial training is a "
                         "tier-3 (resident_ml) protocol")
    if tier == "resident":
        fwd = make_resident_forward(cfg, mesh, train=True)
    elif tier == "resident_ml":
        from gridgcn_tpu.parallel.resident_ml import make_resident_ml_forward
        if batch_axis is not None:
            from gridgcn_tpu.parallel.mesh import SPACE_AXIS
            fwd = make_resident_ml_forward(cfg, mesh, train=True,
                                           ghost_cap=ghost_cap,
                                           axis_name=SPACE_AXIS,
                                           batch_axis=batch_axis)
        else:
            fwd = make_resident_ml_forward(cfg, mesh, train=True,
                                           ghost_cap=ghost_cap)
    else:
        raise ValueError(f"unknown spatial tier: {tier}")
    num_classes = cfg.model.num_classes

    def step(state: TrainState, batch: dict, rng: jax.Array):
        key = jax.random.fold_in(rng, state.step)
        if batch_axis is not None:
            # one independent key per scene row (the batched forward's rng
            # is a key ARRAY [B] — resident_ml docstring)
            key = jax.random.split(key, batch["sx"].shape[0])

        def loss_fn(params):
            v = {"params": params, "batch_stats": state.batch_stats}
            # in_channels > 0: per-point features ride right after sx
            # (make_resident*_forward signature convention)
            pos = ((batch["sx"], batch["sf"], batch["sm"])
                   if cfg.model.in_channels else
                   (batch["sx"], batch["sm"]))
            overflow = jnp.zeros((), jnp.int32)
            if tier == "resident":
                logits, stats = fwd(v, *pos, batch["edges"],
                                    batch["origin"], batch["vsize"], key)
            else:
                logits, overflow, stats = fwd(
                    v, *pos, batch["edges"],
                    batch["origin"], batch["extent"], key)
                # calibrated caps (--ghost-cap auto) are an ESTIMATE from a
                # sample of scenes; the counter is the per-step verification
                # (calibrate_ghost_cap docstring) — surface it so the train
                # loop can warn instead of silently reading stale ghosts
                overflow = jnp.sum(overflow)
            logits = logits.astype(jnp.float32)
            onehot = jax.nn.one_hot(batch["label"], num_classes,
                                    dtype=logits.dtype)
            ce = optax.softmax_cross_entropy(logits, onehot)
            owned = batch["owned"]
            if cfg.model.ignore_label is not None:
                owned = owned & (batch["label"] != cfg.model.ignore_label)
            w = owned.astype(ce.dtype)
            if class_weights is not None:
                w = w * jnp.sum(onehot * class_weights.astype(ce.dtype), -1)
            loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-6)
            n = jnp.maximum(jnp.sum(owned), 1)
            acc = jnp.sum(jnp.where(owned,
                                    jnp.argmax(logits, -1) == batch["label"],
                                    False)) / n
            return loss, (acc, stats, overflow)

        (loss, (acc, stats, overflow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        from gridgcn_tpu.parallel.resident import _merge_stats
        new_stats = _merge_stats(dict(state.batch_stats), stats)
        state = state.replace(batch_stats=new_stats)
        metrics = {"loss": loss, "acc": acc,
                   "grad_norm": optax.global_norm(grads)}
        if tier == "resident_ml":
            metrics["ghost_overflow"] = overflow
        if sched is not None:
            metrics["lr"] = sched(state.step)
        return state, metrics

    return jax.jit(step)


def shard_scene_batch(cfg: Config, xyz: np.ndarray, labels: np.ndarray,
                      mask: np.ndarray, mesh: Mesh, capacity: int,
                      feat: Optional[np.ndarray] = None) -> dict:
    """Host-side: partition one scene into per-shard slabs + ghost strips
    and stage it on the mesh. Labels ride the same scatter as points;
    ghost rows carry owned=False so they never contribute to the loss.
    `feat` [N, in_channels] is required when cfg.model.in_channels > 0."""
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    res0 = cfg.model.layers[0].resolution

    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None], res0)
    origin = np.asarray(origin)[0]
    vsize = np.asarray(vsize)[0]

    sx, sm, owned, sidx, edges = partition_scene(
        xyz, mask, D, resident_halo(cfg, vsize), capacity)
    slab_labels = labels[sidx] * sm    # padded rows → label 0, owned=False

    sh = NamedSharding(mesh, P(DATA_AXIS))
    extra = {}
    if cfg.model.in_channels:
        if feat is None:
            raise ValueError(
                f"cfg.model.in_channels={cfg.model.in_channels} requires "
                f"per-point feat [N, in_channels]")
        sf = feat[sidx] * sm[..., None].astype(feat.dtype)
        extra["sf"] = jax.device_put(sf, sh)
    return {
        **extra,
        "sx": jax.device_put(sx, sh),
        "sm": jax.device_put(sm, sh),
        "owned": jax.device_put(owned, sh),
        "label": jax.device_put(slab_labels.astype(np.int32), sh),
        "edges": jnp.asarray(edges),
        "origin": jnp.asarray(origin),
        "vsize": jnp.asarray(vsize),
        "extent": jnp.asarray(vsize * res0 / (1.0 + 1e-5)),
    }


def shard_scene_batches(cfg: Config, scenes_xyz: np.ndarray,
                        labels: np.ndarray, masks: np.ndarray, mesh: Mesh,
                        capacity: Optional[int] = None,
                        feats: Optional[np.ndarray] = None) -> dict:
    """Scene-batched twin of `shard_scene_batch` for 2-D (data × space)
    spatial TRAINING (VERDICT r4 #7's composition, train side): B scenes
    [B, N, 3] are each partitioned into Ds slabs exactly as the per-scene
    path, then stacked — the leading scene axis rides DATA_AXIS, each
    scene's slabs ride SPACE_AXIS. One static `capacity` (default: the max
    per-scene suggestion) keeps a single compiled step across scenes.
    Feeds `make_spatial_train_step(..., tier="resident_ml",
    batch_axis=DATA_AXIS)` on a `mesh.make_mesh2d` mesh."""
    from gridgcn_tpu.parallel.mesh import SPACE_AXIS
    from gridgcn_tpu.parallel.spatial import suggest_capacity

    if SPACE_AXIS not in mesh.axis_names or DATA_AXIS not in mesh.axis_names:
        raise ValueError(f"need a ('{DATA_AXIS}', '{SPACE_AXIS}') mesh "
                         f"(make_mesh2d); got axes {mesh.axis_names}")
    Ds = int(mesh.shape[SPACE_AXIS])
    scenes_xyz = np.asarray(scenes_xyz, np.float32)
    masks = np.asarray(masks, bool)
    labels = np.asarray(labels)
    B = scenes_xyz.shape[0]
    if B % int(mesh.shape[DATA_AXIS]):
        raise ValueError(f"scene count {B} not divisible by the data axis "
                         f"({mesh.shape[DATA_AXIS]})")
    C_in = cfg.model.in_channels
    if C_in and feats is None:
        raise ValueError(f"cfg.model.in_channels={C_in} requires "
                         f"feats [B, N, {C_in}]")
    res0 = cfg.model.layers[0].resolution

    geo = []
    caps_needed = []
    for b in range(B):
        origin, vsize = grid_bounds(jnp.asarray(scenes_xyz[b])[None],
                                    jnp.asarray(masks[b])[None], res0)
        origin = np.asarray(origin)[0]
        vsize = np.asarray(vsize)[0]
        halo = resident_halo(cfg, vsize)
        caps_needed.append(suggest_capacity(scenes_xyz[b], masks[b], Ds,
                                            halo))
        geo.append((origin, vsize, halo))
    cap = capacity if capacity is not None else max(caps_needed)

    sxs, sms, owneds, sls, sfs = [], [], [], [], []
    edges_l, origins, vsizes, extents = [], [], [], []
    for b in range(B):
        origin, vsize, halo = geo[b]
        sx, sm, owned, sidx, edges = partition_scene(
            scenes_xyz[b], masks[b], Ds, halo, cap)
        sxs.append(sx)
        sms.append(sm)
        owneds.append(owned)
        sls.append(labels[b][sidx] * sm)
        edges_l.append(edges)
        origins.append(origin)
        vsizes.append(vsize)
        extents.append(vsize * res0 / (1.0 + 1e-5))
        if C_in:
            sfs.append(np.asarray(feats[b], np.float32)[sidx]
                       * sm[..., None].astype(np.float32))

    per_scene = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    extra = {}
    if C_in:
        extra["sf"] = jax.device_put(np.stack(sfs), per_scene)
    return {
        **extra,
        "sx": jax.device_put(np.stack(sxs), per_scene),
        "sm": jax.device_put(np.stack(sms), per_scene),
        "owned": jax.device_put(np.stack(owneds), per_scene),
        "label": jax.device_put(np.stack(sls).astype(np.int32), per_scene),
        "edges": jax.device_put(np.stack(edges_l), data_sh),
        "origin": jax.device_put(np.stack(origins), data_sh),
        "vsize": jax.device_put(np.stack(vsizes), data_sh),
        "extent": jax.device_put(np.stack(extents), data_sh),
    }

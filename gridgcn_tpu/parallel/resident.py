"""F-22 tier 2: fully-resident spatially-sharded segmentation forward.

Tier 1 (`spatial.sharded_scene_apply`) re-runs the FULL network per slab,
so its host-provided halo must cover the context reach of EVERY encoder
level — and the reach of a coarse grid (resolution 8 over the scene) is a
quarter of the scene, which defeats the sharding. This module is the
principled fix, exploiting the pyramid's shape on a TPU mesh:

  * the **dense level** — layer-0 CAGQ/GCA and the final decoder
    interpolation + head, which is where ~90% of the FLOPs and all of the
    N-sized memory live — runs **spatially sharded**: each device owns a
    slab of the scene plus a ghost strip just wide enough for the FINEST
    grid's context reach (2 voxels of the layer-0 grid, not the coarse one);
  * every shard builds its voxel tables on the **global grid** (explicit
    `bounds=` — voxel planes align across shards, SURVEY §7/F-22's
    "partition the voxel grid");
  * each shard samples its share (M₁/D) of layer-1 centers from its own
    slab, keeps those whose position it owns, and ONE `all_gather` over ICI
    assembles the full layer-1 level (the point-cloud analog of ring
    attention's KV exchange — except the pyramid lets us pay it once);
  * the coarse pyramid (layers 1.., decoder stages down to level 1) is
    M-sized — a few thousand points — and runs **replicated** on every
    shard with shard-identical RNG, so no further communication is needed
    until the gradient psum.

Per-point outputs are produced for each shard's owned dense points and
stitched back in original order. Gradients flow through the all_gather, so
`jax.grad` of an owned-masked loss + the mesh's gradient psum gives
fully-resident TRAINING on scenes whose dense level never exists on any
single chip.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gridgcn_tpu.configs.base import Config
from gridgcn_tpu.models.segmentation import GridGCNSegmentation
from gridgcn_tpu.ops.voxelize import grid_bounds
from gridgcn_tpu.parallel.mesh import DATA_AXIS, fetch_global
from gridgcn_tpu.parallel.spatial import partition_scene


def _resident_model(cfg: Config, n_shards: int) -> GridGCNSegmentation:
    """The per-shard model: layer 0 samples M₁/D centers (each shard covers
    its slab); deeper layers are replicated and keep their global sizes.
    Parameter shapes do not depend on n_centers, so the standard network's
    variables are used as-is."""
    l0 = cfg.model.layers[0]
    if l0.n_centers % n_shards:
        raise ValueError(
            f"layers[0].n_centers={l0.n_centers} not divisible by "
            f"{n_shards} shards")
    layers = (dataclasses.replace(l0, n_centers=l0.n_centers // n_shards),
              *cfg.model.layers[1:])
    return GridGCNSegmentation(cfg=dataclasses.replace(
        cfg.model, layers=layers))


def _merge_stats(dst: dict, src: dict) -> dict:
    """Deep-merge flax collection dicts (disjoint module paths per call)."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge_stats(dst[k], v)
        else:
            dst[k] = v
    return dst


def make_resident_forward(cfg: Config, mesh: Mesh,
                          axis_name: str = DATA_AXIS, train: bool = False,
                          _corrupt_gather: bool = False):
    """Build the jitted sharded forward.

    Returns fwd(variables, shard_xyz [D,cap,3], shard_mask [D,cap],
                edges [D+1], origin [3], vsize [3], rng)
              -> logits [D, cap, num_classes]             (train=False)
              -> (logits, batch_stats updates)            (train=True)
    When cfg.model.in_channels > 0 the signature gains shard_feat
    [D, cap, in_channels] right after shard_xyz (input features ride the
    host partition like xyz; deeper levels travel in the all_gather).
    with the leading logits axis sharded over `axis_name`. Ghost-point
    logits are meaningless — consumers mask with `owned`. train=True runs
    BatchNorm in batch mode and dropout live; per-shard BN statistics are
    pmean'd over the mesh (the standard cross-replica BN approximation, as
    in data parallelism) and returned replicated, enabling fully-resident
    spatially-sharded TRAINING (SURVEY §2.4 F-22).

    `_corrupt_gather` (tests only): rolls the assembled layer-1 FEATURE
    rows one position after the all_gather while positions stay put —
    emulating a mis-assembled level. The trained equivalence gates must
    FAIL under it (mutation sensitivity, SURVEY §4.2 #5); never set it
    outside tests.
    """
    if cfg.model.task != "seg":
        raise ValueError("resident forward is for segmentation models")
    C_in = cfg.model.in_channels
    n_layers = len(cfg.model.layers)
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    model = _resident_model(cfg, D)

    def shard_fn(variables, sx, sf, sm, edges, origin, vsize, rng):
        # per-shard blocks keep the sharded leading axis at size 1:
        # sx [1, cap, 3], sm [1, cap] — it doubles as the batch dim
        d = jax.lax.axis_index(axis_name)
        # shard-distinct keys for the sharded level, shard-IDENTICAL keys
        # for the replicated coarse pyramid (divergence there would be a
        # correctness bug, not noise)
        def _with_dropout(rngs, salt):
            if train and cfg.model.dropout > 0:
                rngs = dict(rngs, dropout=jax.random.fold_in(rng, salt))
            return rngs
        local_rngs = _with_dropout(
            {"cagq": jax.random.fold_in(rng, d)}, 77_000)
        def shared_rngs(i):
            return _with_dropout(
                {"cagq": jax.random.fold_in(rng, 10_000 + i)}, 88_000 + i)

        # Running-stat threading (round-5 fix): a mutable apply returns the
        # FULL batch_stats collection — modules the called method did not
        # touch come back with their OLD values — so merging per-call
        # collections lets a later call's stale entries overwrite an
        # earlier call's update, and only the LAST call's BN stats ever
        # reach the train state (caught by the round-5 spatial convergence
        # run: every encoder/decoder BN stayed at init and held-out eval
        # with running stats read chance while train-mode metrics looked
        # healthy). Feed each call the latest collection instead; the last
        # return is then complete and correct.
        stats_cell: dict = {"bs": None}

        def apply(vars_, *args, method, rngs=None):
            if not train:
                return model.apply(vars_, *args, method=method, rngs=rngs)
            if stats_cell["bs"] is not None:
                vars_ = dict(vars_, batch_stats=stats_cell["bs"])
            out, mut = model.apply(vars_, *args, method=method, rngs=rngs,
                                   mutable=["batch_stats"])
            stats_cell["bs"] = mut["batch_stats"]
            return out

        # input features mirror the monolithic network's convention
        # (segmentation.__call__: xyz prefixed when use_xyz_feature);
        # halo points carry their features via the host partition
        if C_in:
            feat0 = (jnp.concatenate([sx, sf], -1)
                     if cfg.model.use_xyz_feature else sf)
        else:
            feat0 = sx if cfg.model.use_xyz_feature else None

        # ---- layer 0: sharded, on the global grid ----
        c_xyz, c_feat, c_valid = apply(
            variables, 0, sx, feat0, sm, train,
            (origin[None], vsize[None]),
            method="encode_layer", rngs=local_rngs)

        # ownership: a center belongs to the shard whose slab contains it
        lo, hi = edges[d], edges[d + 1]
        cx = c_xyz[0, :, 0]
        c_valid = c_valid[0] & (cx >= lo) & (cx < hi)

        # ---- ONE ICI exchange: assemble the full layer-1 level ----
        g_xyz = jax.lax.all_gather(c_xyz[0], axis_name, tiled=True)[None]
        g_feat = jax.lax.all_gather(c_feat[0], axis_name, tiled=True)[None]
        g_valid = jax.lax.all_gather(c_valid, axis_name, tiled=True)[None]
        if _corrupt_gather:   # tests only: mis-assembled level mutation
            g_feat = jnp.roll(g_feat, 1, axis=1)

        # ---- coarse pyramid: replicated ----
        levels = [(g_xyz, g_feat, g_valid)]
        xyz, feat, mask = g_xyz, g_feat, g_valid
        for i in range(1, n_layers):
            xyz, feat, mask = apply(
                variables, i, xyz, feat, mask, train, None,
                method="encode_layer", rngs=shared_rngs(i))
            levels.append((xyz, feat, mask))

        c_xyz2, c_feat2, c_mask2 = levels[-1]
        for i in range(n_layers - 1):
            d_xyz, d_feat, d_mask = levels[-2 - i]
            c_feat2 = apply(
                variables, i, c_xyz2, c_feat2, c_mask2,
                d_xyz, d_feat, d_mask, train,
                method="decode_stage", rngs=shared_rngs(100 + i))
            c_xyz2, c_mask2 = d_xyz, d_mask

        # ---- final stage + head: sharded (dense level = local slab) ----
        x = apply(
            variables, n_layers - 1, c_xyz2, c_feat2, c_mask2,
            sx, feat0, sm, train,
            method="decode_stage", rngs=local_rngs)
        logits = apply(variables, x, train, method="head_logits",
                       rngs=_with_dropout({}, 99_000))
        if not train:
            return logits
        # cross-shard BN statistics, as in data-parallel training
        stats_mean = jax.tree.map(
            lambda x: jax.lax.pmean(x, axis_name), stats_cell["bs"])
        return logits, stats_mean

    out_specs = (P(axis_name), P()) if train else P(axis_name)
    if C_in:
        fn = shard_fn
        in_specs = (P(), P(axis_name), P(axis_name), P(axis_name),
                    P(), P(), P(), P())
    else:
        def fn(variables, sx, sm, edges, origin, vsize, rng):
            return shard_fn(variables, sx, None, sm, edges, origin,
                            vsize, rng)
        in_specs = (P(), P(axis_name), P(axis_name), P(), P(), P(), P())
    fwd = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)
    return jax.jit(fwd)


def resident_halo(cfg: Config, vsize: np.ndarray) -> float:
    """Ghost-strip width for the sharded level: the FINEST grid's context
    reach — (context//2 + 1) layer-0 voxels (context query + barycenter
    offset) — not the coarse grids', which the replicated pyramid covers."""
    reach = cfg.model.layers[0].context // 2 + 1
    return float(reach * np.max(vsize))


def resident_seg_predict(cfg: Config, variables, xyz: np.ndarray,
                         mask: np.ndarray, mesh: Mesh,
                         capacity: Optional[int] = None,
                         rng: Optional[jax.Array] = None,
                         fwd=None, votes: int = 1,
                         feat: Optional[np.ndarray] = None,
                         halo: Optional[float] = None) -> np.ndarray:
    """Whole-scene per-point logits with the dense level sharded over the
    mesh. xyz [N, 3], mask [N] → logits [N, num_classes] (zeros for invalid
    points). Pass a prebuilt `fwd` (make_resident_forward) to reuse the
    compiled executable across scenes. `capacity` = static per-shard point
    budget (default: auto-sized to the scene's max slab+halo occupancy —
    ~N/D, NOT N, so shards hold only their slab). `votes` > 1
    logit-averages that many CAGQ seeds (rng fold_in per vote) —
    partitioning and parameter staging happen once, not per vote."""
    from gridgcn_tpu.parallel.spatial import suggest_capacity

    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    res0 = cfg.model.layers[0].resolution

    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None], res0)
    origin = np.asarray(origin)[0]
    vsize = np.asarray(vsize)[0]

    # `halo` override: experimentation/mutation-testing hook (the default
    # is the finest grid's context reach, the protocol's requirement)
    halo = resident_halo(cfg, vsize) if halo is None else halo
    if capacity is None:
        capacity = suggest_capacity(xyz, mask, D, halo)
    sx, sm, owned, sidx, edges = partition_scene(
        xyz, mask, D, halo, capacity)

    if fwd is None:
        fwd = make_resident_forward(cfg, mesh)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    sh = NamedSharding(mesh, P(DATA_AXIS))
    # replicate params onto the mesh (checkpoint restores commit to one device)
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    if cfg.model.in_channels:
        if feat is None:
            raise ValueError(
                f"cfg.model.in_channels={cfg.model.in_channels} requires "
                f"per-point feat [N, in_channels]")
        sf = feat[sidx] * sm[..., None].astype(feat.dtype)
        sx, sm = jax.device_put(sx, sh), jax.device_put(sm, sh)
        pos_args = (sx, jax.device_put(sf, sh), sm)
    else:
        sx, sm = jax.device_put(sx, sh), jax.device_put(sm, sh)
        pos_args = (sx, sm)
    edges_d, origin_d, vsize_d = (jnp.asarray(edges), jnp.asarray(origin),
                                  jnp.asarray(vsize))
    acc = None
    for v in range(votes):
        k = jax.random.fold_in(rng, v) if votes > 1 else rng
        lg = fwd(variables, *pos_args, edges_d, origin_d, vsize_d, k)
        acc = lg if acc is None else acc + lg
    logits = fetch_global(acc) / votes

    C = logits.shape[-1]
    out = np.zeros((xyz.shape[0], C), logits.dtype)
    flat_owned = owned.reshape(-1)
    out[sidx.reshape(-1)[flat_owned]] = logits.reshape(-1, C)[flat_owned]
    return out

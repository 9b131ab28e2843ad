"""F-22 tier 3: multi-layer feature-halo spatially-sharded segmentation.

Tier 2 (`parallel.resident`) shards only the DENSE level and replicates the
coarse pyramid after one all_gather — right when the coarse levels are small.
This module is the fully-sharded protocol for scenes whose *every* level
outgrows one chip: no level is ever assembled anywhere; the mesh exchanges
fixed-capacity **boundary halos** instead (SURVEY §2.4 F-22 — the point-cloud
analog of ring attention's rotating KV, paid once per layer):

  encoder, per GridConv level i (all on the GLOBAL voxel grid, explicit
  bounds, so voxel planes align across shards):
    * each shard holds its slab's entities + ghost copies of both
      neighbors' boundary strips;
    * it samples its share (M_i/D) of centers and keeps those whose
      position it owns (slab interval test);
    * two `ppermute`s ship the owned centers within one context-reach of
      each slab face — positions AND features — into the neighbors' ghost
      buffers for level i+1. Everything else stays local.

  decoder, per feature-propagation stage (coarse → dense):
    * each shard interpolates ALL its local entities (owned exact; ghosts
      recomputed only approximately, since a ghost's own neighborhood is
      clipped);
    * a **ghost refresh** then overwrites every ghost's features with the
      owner's exact values — the owner re-sends the same boundary rows
      (selection indices were fixed at encode time), so stage n+1 reads
      exact stage-n features everywhere. Boundary error does not compound.

  3-NN caveat: a query's true k-th nearest support could in principle lie
  beyond the ghost strip; with ghost width ≥ the coarse grid's context
  reach this is the same locality assumption the reference's grid-query
  decoder (gridify_up, SURVEY §2.1 F-05) already makes.

Gradients flow through every ppermute (its transpose is the reverse
permutation), so `jax.grad` of an owned-masked loss plus the mesh gradient
psum trains fully resident: no level of the pyramid ever exists whole.
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
from gridgcn_tpu.parallel.resident import resident_halo
from gridgcn_tpu.parallel.spatial import partition_scene


def _shift(x: jax.Array, axis_name: str, direction: int) -> jax.Array:
    """ppermute by ±1 along the slab ring; the wrapped end receives zeros."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + direction) % n) for i in range(n)]
    y = jax.lax.ppermute(x, axis_name, perm)
    wrapped = (idx == 0) if direction == 1 else (idx == n - 1)
    return jnp.where(wrapped, jnp.zeros_like(y), y)


def _band_index(x: jax.Array, sel: jax.Array, H: int):
    """Indices of up to H selected rows (order preserved):
    (idx [H], ok [H], dropped scalar).

    Overflowing rows are dropped — ghost capacity is a config choice like
    every other fixed capacity in this framework (SURVEY §7 H1) — but the
    drop count is surfaced so callers can size ghost_cap from data instead
    of discovering silent accuracy loss (ADVICE r1 #2)."""
    M = x.shape[0]
    rank = jnp.cumsum(sel) - 1
    # every row gets its OWN destination: kept rows land at their rank,
    # unselected/overflowing rows at a private slot ≥ H that the final
    # [:H] slice discards — so the unique_indices promise is honest (the
    # previous form sent ALL dropped rows to one sentinel slot, which is
    # duplicate indices under a uniqueness promise = undefined behavior)
    arange = jnp.arange(M, dtype=jnp.int32)
    dest = jnp.where(sel & (rank < H), rank, H + arange)
    idx = jnp.full((H + M,), -1, jnp.int32).at[dest].set(
        arange, unique_indices=True)[:H]
    dropped = jnp.maximum(jnp.sum(sel.astype(jnp.int32)) - H, 0)
    return jnp.maximum(idx, 0), idx >= 0, dropped


def _take(arr: jax.Array, idx: jax.Array, ok: jax.Array) -> jax.Array:
    out = arr[idx]
    return jnp.where(ok[(...,) + (None,) * (out.ndim - 1)], out, 0)


def exchange_boundary(xyz, feat, valid, lo, hi, width, H, axis_name):
    """Ship owned boundary entities to both slab neighbors.

    xyz [M, 3], feat [M, C], valid [M] are this shard's OWNED level
    entities; [lo, hi) its slab interval on the partition axis. Returns
      (g_xyz [2H, 3], g_feat [2H, C], g_valid [2H],
       send [(idx_r, ok_r), (idx_l, ok_l)], dropped scalar)
    — ghosts received from the left and right neighbors, the send
    selections (fixed row layout) that `refresh_ghosts` reuses so decoder
    updates land in the same ghost slots, and the count of boundary rows
    this shard could NOT ship because the per-face buffer H overflowed."""
    x = xyz[:, 0]
    idx_r, ok_r, drop_r = _band_index(x, valid & (x >= hi - width), H)
    idx_l, ok_l, drop_l = _band_index(x, valid & (x < lo + width), H)
    parts = []
    for direction, (idx, ok) in ((1, (idx_r, ok_r)), (-1, (idx_l, ok_l))):
        g_xyz = _shift(_take(xyz, idx, ok), axis_name, direction)
        g_feat = _shift(_take(feat, idx, ok), axis_name, direction)
        g_ok = _shift(ok, axis_name, direction)
        parts.append((g_xyz, g_feat, g_ok))
    (lx, lf, lv), (rx, rf, rv) = parts   # from left neighbor, from right
    return (jnp.concatenate([lx, rx]), jnp.concatenate([lf, rf]),
            jnp.concatenate([lv, rv]), ((idx_r, ok_r), (idx_l, ok_l)),
            drop_r + drop_l)


def refresh_ghosts(feat_own, send, axis_name):
    """Re-send updated features of the SAME boundary rows; returns the
    refreshed ghost feature block [2H, C] (left-neighbor rows first,
    matching exchange_boundary's concat order)."""
    (idx_r, ok_r), (idx_l, ok_l) = send
    lf = _shift(_take(feat_own, idx_r, ok_r), axis_name, 1)
    rf = _shift(_take(feat_own, idx_l, ok_l), axis_name, -1)
    return jnp.concatenate([lf, rf])


def ghost_band_widths(cfg: Config, extent: np.ndarray) -> list:
    """Per-level ghost band width in world units — the SAME reach rule the
    tier-3 forward uses (`make_resident_ml_forward`): level i's boundary
    band must cover the context reach of the NEXT level's grid (the last
    level covers its own, as first decode support)."""
    widths = []
    n = len(cfg.model.layers)
    for i, l in enumerate(cfg.model.layers):
        spec = cfg.model.layers[i + 1] if i + 1 < n else l
        vsize = np.max(extent) * (1.0 + 1e-5) / spec.resolution
        widths.append(float((spec.context // 2 + 1) * vsize))
    return widths


def calibrate_ghost_cap(cfg: Config, xyz: np.ndarray, mask: np.ndarray,
                        n_shards: int, safety: float = 2.0,
                        round_to: int = 8) -> tuple:
    """Per-level ghost_cap sized from measured boundary-band occupancy
    instead of the zero-overflow full-share default (VERDICT r3 #3).

    The full-share default guarantees zero overflow but maximizes the
    ghost-compute TAX: every level carries 2× its owned rows as static
    ghost buffers through sampling/gather/GCA (measured +31% at the
    degenerate mesh=1 point, design.md §13). The true need is the band
    occupancy: a level's centers follow the slab's point distribution, so
    the expected owned centers within `width` of a face is
    (per-shard share) × (the slab's point fraction inside the band).
    This measures that fraction per interior face/side on the actual
    scene, takes the worst case × `safety`, and clamps to [8, share].

    The estimate is VERIFIED, not trusted: the forward's ghost_overflow
    counters report any boundary row a shard failed to ship — nonzero
    means raise `safety` (capacities are config like every other fixed
    capacity in this framework, SURVEY §7 H1).
    """
    from gridgcn_tpu.parallel.spatial import _slab_edges

    pts = np.asarray(xyz)[np.asarray(mask)]
    x = pts[:, 0]
    edges = _slab_edges(x, n_shards)
    res0 = cfg.model.layers[0].resolution
    origin, vsize = grid_bounds(jnp.asarray(pts)[None],
                                jnp.ones((1, len(pts)), bool), res0)
    extent = np.asarray(vsize)[0] * res0 / (1.0 + 1e-5)

    caps = []
    for l, width in zip(cfg.model.layers, ghost_band_widths(cfg, extent)):
        share = max(1, l.n_centers // n_shards)
        worst = 0.0
        for d in range(n_shards):
            in_slab = (x >= edges[d]) & (x < edges[d + 1])
            n_slab = max(int(in_slab.sum()), 1)
            # band against the right face (ships right) and the left face
            if d + 1 < n_shards:
                worst = max(worst, float(
                    (in_slab & (x >= edges[d + 1] - width)).sum()) / n_slab)
            if d > 0:
                worst = max(worst, float(
                    (in_slab & (x < edges[d] + width)).sum()) / n_slab)
        need = int(np.ceil(share * worst * safety))
        need = -(-max(need, round_to) // round_to) * round_to
        caps.append(int(min(need, max(8, share))))
    return tuple(caps)


def make_resident_ml_forward(cfg: Config, mesh: Mesh, ghost_cap=0,
                             axis_name: str = DATA_AXIS,
                             train: bool = False,
                             debug_capture: bool = False,
                             batch_axis: str | None = None):
    """Build the jitted fully-sharded multi-level forward.

    Returns fwd(variables, shard_xyz [D,cap,3], shard_mask [D,cap],
                edges [D+1], origin [3], extent [3], rng)
              -> (logits [D, cap, num_classes], ghost_overflow [D] int32)
              -> (logits, ghost_overflow, batch_stats)       (train=True)
    When cfg.model.in_channels > 0 (e.g. the S3DIS config's 6 rgb/normalized
    channels, SURVEY §2.3 F-13), the signature gains shard_feat
    [D, cap, in_channels] right after shard_xyz: input-level features ride
    the host partitioning like xyz (halo points carry theirs), and every
    deeper level's features already travel in the boundary exchange
    (`exchange_boundary` ships arbitrary-width feat).
    with the leading axes sharded over `axis_name`; ghost-point logits are
    meaningless (mask with `owned`). `ghost_cap` = per-face ghost buffer
    rows per level — an int for all levels or a per-level sequence
    (`calibrate_ghost_cap` sizes one from data). Default 0 = the shard's
    full center share, which cannot overflow but maximizes the
    ghost-compute tax (design.md §13: +31% at the degenerate mesh=1
    point); set lower to trade boundary fidelity for ghost volume.
    `ghost_overflow[d]` counts boundary rows shard d failed to ship across
    all levels/faces — nonzero means the decoder read stale/zero ghosts;
    raise ghost_cap (ADVICE r1 #2).

    `batch_axis` (VERDICT r4 #7) composes scene-batch DP with the spatial
    sharding on a 2-D (`batch_axis`, `axis_name`) mesh
    (`mesh.make_mesh2d`): every per-scene argument gains a LEADING scene
    axis sharded over `batch_axis` — sx [B, Ds, cap, 3], sm [B, Ds, cap],
    edges [B, Ds+1], origin/extent [B, 3], and rng becomes a key ARRAY
    [B] (one per scene) — and the per-scene program is vmapped, so each
    scene's halo ppermutes ride its own spatial ring concurrently.
    Per-scene outputs are identical to the 1-D forward
    (test_spatial.test_scene_batched_tier3_matches_per_scene). With
    `train=True` the gradient of a pooled owned-masked loss matches the
    pooled per-scene 1-D gradients (test_scene_batched_tier3_train_*),
    and BN batch stats are merged ring-first then across scenes.

    `debug_capture` (eval only) appends a per-decode-stage capture of the
    post-ghost-refresh level state — a tuple of (xyz [D,R,3],
    feat [D,R,C], valid [D,R], owned [D,R]) for every stage that carries
    ghosts — so tests can assert the protocol's bitwise ghost-exactness
    claim (module docstring: refreshed ghost features ARE the owner's
    values) inside the real forward, not just at the primitive level.
    """
    if debug_capture and train:
        raise ValueError("debug_capture is an eval-only instrument")
    if cfg.model.task != "seg":
        raise ValueError("resident-ml forward is for segmentation models")
    C_in = cfg.model.in_channels
    n_layers = len(cfg.model.layers)
    # spatial shard count = the SIZE OF THE SPATIAL AXIS, not the whole
    # mesh — on a 2-D (batch_axis, axis_name) mesh the batch axis carries
    # whole scenes and must not dilute the per-level center shares
    D = int(mesh.shape[axis_name])
    # every layer samples its share M_i/D of centers (tier 2 divides only
    # layer 0 — here the whole pyramid is sharded)
    for i, l in enumerate(cfg.model.layers):
        if l.n_centers % D:
            raise ValueError(f"layers[{i}].n_centers={l.n_centers} not "
                             f"divisible by {D} shards")
    layers = tuple(dataclasses.replace(l, n_centers=l.n_centers // D)
                   for l in cfg.model.layers)
    caps = (tuple(int(c) for c in ghost_cap)
            if isinstance(ghost_cap, (tuple, list, np.ndarray))
            else (int(ghost_cap),) * n_layers)
    if len(caps) != n_layers:
        raise ValueError(f"ghost_cap sequence needs {n_layers} entries, "
                         f"got {len(caps)}")
    model = GridGCNSegmentation(cfg=dataclasses.replace(
        cfg.model, layers=layers))
    specs = model.cfg.layers

    def shard_fn(variables, sx, sf, sm, edges, origin, extent, rng):
        d = jax.lax.axis_index(axis_name)
        lo, hi = edges[d], edges[d + 1]

        def rngs(i):
            r = {"cagq": jax.random.fold_in(
                jax.random.fold_in(rng, i), d)}
            if train and cfg.model.dropout > 0:
                r["dropout"] = jax.random.fold_in(rng, 55_000 + i)
            return r

        # Running-stat threading (round-5 fix, see resident.py): feed each
        # mutable apply the LATEST batch_stats collection — merging
        # per-call returns instead lets later calls' stale entries
        # overwrite earlier updates, so only the head BN's running stats
        # ever reached the train state and held-out eval with running
        # stats read chance (caught by the spatial convergence run).
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

        def bounds_for(spec):
            vsize = extent * (1.0 + 1e-5) / spec.resolution
            return (origin[None], vsize[None]), vsize

        def reach(spec, vsize):
            return (spec.context // 2 + 1) * jnp.max(vsize)

        overflow = jnp.zeros((), jnp.int32)
        # input features mirror the monolithic network's convention
        # (segmentation.__call__: xyz prefixed when use_xyz_feature)
        if C_in:
            feat0 = (jnp.concatenate([sx, sf], -1)
                     if cfg.model.use_xyz_feature else sf)
        else:
            feat0 = sx if cfg.model.use_xyz_feature else None
        # level state: (xyz [1,Ci,3], feat, valid, owned, send or None)
        levels = [(sx, feat0, sm[0], sm[0] & (sx[0, :, 0] >= lo)
                   & (sx[0, :, 0] < hi), None)]

        xyz, feat, valid = sx, feat0, sm
        for i in range(n_layers):
            bounds, vsize = bounds_for(specs[i])
            c_xyz, c_feat, c_valid = apply(
                variables, i, xyz, feat, valid, train, bounds,
                method="encode_layer", rngs=rngs(i))
            cx = c_xyz[0, :, 0]
            own = c_valid[0] & (cx >= lo) & (cx < hi)

            if i + 1 < n_layers:
                _, next_vsize = bounds_for(specs[i + 1])
                width = reach(specs[i + 1], next_vsize)
            else:
                # last level still feeds the first decode stage as support
                width = reach(specs[i], vsize)
            # Default: the full per-shard share. A shard owns at most
            # specs[i].n_centers rows at this level, so a band can never
            # hold more — overflow is impossible unless the caller lowers
            # ghost_cap to trade ghost volume for speed.
            H = caps[i] or max(8, specs[i].n_centers)
            g_xyz, g_feat, g_ok, send, dropped = exchange_boundary(
                c_xyz[0], c_feat[0], own, lo, hi, width, H, axis_name)
            overflow = overflow + dropped

            xyz = jnp.concatenate([c_xyz[0], g_xyz])[None]
            feat = jnp.concatenate([c_feat[0], g_feat])[None]
            valid = jnp.concatenate([own, g_ok])[None]
            owned = jnp.concatenate([own, jnp.zeros_like(g_ok)])
            levels.append((xyz, feat, valid[0], owned, send))

        # ---- decoder: interpolate locally, then refresh ghosts ----
        captures = []
        c_xyz, c_feat = levels[-1][0], levels[-1][1]
        c_mask = levels[-1][2][None]
        for i in range(n_layers):
            d_xyz, d_feat, d_valid, d_owned, d_send = levels[-2 - i]
            new_feat = apply(
                variables, i, c_xyz, c_feat, c_mask,
                d_xyz, d_feat, d_valid[None], train,
                method="decode_stage", rngs=rngs(100 + i))
            if d_send is not None:
                # own rows precede the 2H ghost rows by construction;
                # overwrite ghost features with the owners' exact values
                H = d_send[0][0].shape[0]
                own_feat = new_feat[0, : new_feat.shape[1] - 2 * H]
                g_new = refresh_ghosts(own_feat, d_send, axis_name)
                new_feat = jnp.concatenate([own_feat, g_new])[None]
                if debug_capture:
                    captures.append((d_xyz, new_feat, d_valid[None],
                                     d_owned[None]))
            c_xyz, c_feat, c_mask = d_xyz, new_feat, d_valid[None]

        logits = apply(variables, c_feat, train, method="head_logits",
                       rngs=rngs(200))
        if not train:
            if debug_capture:
                return logits, overflow[None], tuple(captures)
            return logits, overflow[None]
        stats_mean = jax.tree.map(
            lambda x: jax.lax.pmean(x, axis_name), stats_cell["bs"])
        return logits, overflow[None], stats_mean

    if batch_axis is not None:
        if debug_capture:
            raise ValueError("batch_axis (2-D mesh) resident-ml forward "
                             "does not support debug_capture")

        def bfn(variables, *args):
            if C_in:
                sx, sf, sm, edges, origin, extent, rngs_ = args
            else:
                sx, sm, edges, origin, extent, rngs_ = args
                sf = None

            def one(sx1, sf1, sm1, e1, o1, x1, r1):
                return shard_fn(variables, sx1, sf1, sm1, e1, o1, x1, r1)

            out = jax.vmap(one, in_axes=(0, 0 if C_in else None,
                                         0, 0, 0, 0, 0))(
                sx, sf, sm, edges, origin, extent, rngs_)
            if not train:
                return out
            # train mode: each scene row's BN stats are already pmean'd
            # over its own spatial ring (shard_fn); finish the global
            # cross-scene merge — mean over this device row's local scenes,
            # then pmean over the scene (batch) axis — the standard
            # cross-replica BN approximation extended to the 2-D mesh
            logits, overflow, stats = out
            stats = jax.tree.map(
                lambda x: jax.lax.pmean(jnp.mean(x, axis=0), batch_axis),
                stats)
            return logits, overflow, stats

        per_scene = P(batch_axis, axis_name)
        if C_in:
            in_specs = (P(), per_scene, per_scene, per_scene,
                        P(batch_axis), P(batch_axis), P(batch_axis),
                        P(batch_axis))
        else:
            in_specs = (P(), per_scene, per_scene, P(batch_axis),
                        P(batch_axis), P(batch_axis), P(batch_axis))
        out_specs = ((per_scene, per_scene, P()) if train
                     else (per_scene, per_scene))
        fwd = jax.shard_map(bfn, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs,
                            check_vma=False)
        return jax.jit(fwd)

    if train:
        out_specs = (P(axis_name), P(axis_name), P())
    elif debug_capture:
        # third spec is a pytree prefix covering every captured leaf
        out_specs = (P(axis_name), P(axis_name), P(axis_name))
    else:
        out_specs = (P(axis_name), P(axis_name))
    if C_in:
        fn = shard_fn
        in_specs = (P(), P(axis_name), P(axis_name), P(axis_name),
                    P(), P(), P(), P())
    else:
        def fn(variables, sx, sm, edges, origin, extent, rng):
            return shard_fn(variables, sx, None, sm, edges, origin,
                            extent, rng)
        in_specs = (P(), P(axis_name), P(axis_name), P(), P(), P(), P())
    fwd = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)
    return jax.jit(fwd)


def resident_ml_seg_predict(cfg: Config, variables, xyz: np.ndarray,
                            mask: np.ndarray, mesh: Mesh,
                            capacity: Optional[int] = None,
                            rng: Optional[jax.Array] = None,
                            ghost_cap=0, fwd=None,
                            votes: int = 1,
                            feat: Optional[np.ndarray] = None) -> np.ndarray:
    """Whole-scene per-point logits with EVERY level sharded over the mesh.
    xyz [N, 3], mask [N] → logits [N, num_classes] (zeros for invalid).
    `capacity` = static per-shard point budget (default: auto-sized to the
    scene's max slab+halo occupancy — ~N/D, NOT N). `votes` > 1
    logit-averages that many CAGQ seeds; partitioning and parameter staging
    happen once, not per vote. `feat` [N, in_channels] is required when
    cfg.model.in_channels > 0 (it rides the same partition as xyz).
    `ghost_cap="auto"` calibrates per-level caps from this scene's
    measured boundary-band occupancy (`calibrate_ghost_cap`) — smaller
    ghost buffers = less ghost-compute tax; the overflow counters verify
    the estimate. Caps are baked into the compiled forward, so "auto"
    cannot be combined with a prebuilt `fwd` (raises), and explicit caps
    passed alongside `fwd` must be the ones it was built with."""
    from gridgcn_tpu.parallel.spatial import suggest_capacity

    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if isinstance(ghost_cap, str):
        if ghost_cap != "auto":
            raise ValueError(f"ghost_cap must be int/sequence/'auto', "
                             f"got {ghost_cap!r}")
        if fwd is not None:
            # caps are baked into fwd at build time — a per-scene
            # calibration here could not be honored and would silently
            # measure the fwd's caps instead (build the fwd with
            # calibrate_ghost_cap(...) caps, or drop the fwd argument)
            raise ValueError("ghost_cap='auto' cannot be combined with a "
                             "prebuilt fwd: ghost buffers are sized at "
                             "build time")
        ghost_cap = calibrate_ghost_cap(cfg, xyz, mask, D)
    res0 = cfg.model.layers[0].resolution

    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None], res0)
    origin = np.asarray(origin)[0]
    extent = np.asarray(vsize)[0] * res0 / (1.0 + 1e-5)

    halo = resident_halo(cfg, np.asarray(vsize)[0])
    if capacity is None:
        capacity = suggest_capacity(xyz, mask, D, halo)
    sx, sm, owned, sidx, edges = partition_scene(
        xyz, mask, D, halo, capacity)

    if fwd is None:
        fwd = make_resident_ml_forward(cfg, mesh, ghost_cap=ghost_cap)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    sh = NamedSharding(mesh, P(DATA_AXIS))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    if cfg.model.in_channels:
        if feat is None:
            raise ValueError(
                f"cfg.model.in_channels={cfg.model.in_channels} requires "
                f"per-point feat [N, in_channels]")
        # input-level features ride the same partition as xyz (sidx maps
        # shard rows to original point indices; padded rows zero out)
        sf = feat[sidx] * sm[..., None].astype(feat.dtype)
        sx, sm = jax.device_put(sx, sh), jax.device_put(sm, sh)
        pos_args = (sx, jax.device_put(sf, sh), sm)
    else:
        sx, sm = jax.device_put(sx, sh), jax.device_put(sm, sh)
        pos_args = (sx, sm)
    edges_d, origin_d, extent_d = (jnp.asarray(edges), jnp.asarray(origin),
                                   jnp.asarray(extent))
    acc = None
    for v in range(votes):
        k = jax.random.fold_in(rng, v) if votes > 1 else rng
        lg, overflow = fwd(variables, *pos_args, edges_d, origin_d,
                           extent_d, k)
        acc = lg if acc is None else acc + lg
    # ghost selection depends only on geometry, so overflow is identical
    # across votes — the last fetch stands for all of them
    logits = fetch_global(acc) / votes
    n_over = int(fetch_global(overflow).sum())
    if n_over:
        import warnings
        warnings.warn(
            f"resident-ml: {n_over} boundary rows overflowed the per-face "
            f"ghost buffer (ghost_cap); decoder read stale/zero ghosts — "
            f"raise ghost_cap", RuntimeWarning, stacklevel=2)

    C = logits.shape[-1]
    out = np.zeros((xyz.shape[0], C), logits.dtype)
    flat_owned = owned.reshape(-1)
    out[sidx.reshape(-1)[flat_owned]] = logits.reshape(-1, C)[flat_owned]
    return out


def resident_ml_seg_predict_scenes(cfg: Config, variables,
                                   scenes_xyz, masks, mesh: Mesh,
                                   capacity: Optional[int] = None,
                                   rng: Optional[jax.Array] = None,
                                   ghost_cap=0, feats=None,
                                   fwd=None) -> np.ndarray:
    """Batched whole-scene prediction on a 2-D (scene × slab) mesh
    (VERDICT r4 #7): scenes_xyz [B, N, 3] (+ masks [B, N]) are sharded one
    scene row per DATA_AXIS entry while each scene's voxel slabs ride
    SPACE_AXIS — e.g. 2 scenes × 4 slabs on 8 chips. Per-scene grids,
    slab edges, and halo partitioning are computed host-side exactly as in
    the per-scene path, so outputs match `resident_ml_seg_predict` on a
    1-D mesh scene for scene (equivalence test in test_spatial.py).
    Returns logits [B, N, num_classes]."""
    from gridgcn_tpu.parallel.mesh import SPACE_AXIS
    from gridgcn_tpu.parallel.spatial import suggest_capacity

    if SPACE_AXIS not in mesh.axis_names or DATA_AXIS not in mesh.axis_names:
        raise ValueError(f"need a ('{DATA_AXIS}', '{SPACE_AXIS}') mesh "
                         f"(make_mesh2d); got axes {mesh.axis_names}")
    Ds = mesh.shape[SPACE_AXIS]
    scenes_xyz = np.asarray(scenes_xyz, np.float32)
    masks = np.asarray(masks, bool)
    B, N = scenes_xyz.shape[:2]
    if B % mesh.shape[DATA_AXIS]:
        raise ValueError(f"scene count {B} not divisible by the data axis "
                         f"({mesh.shape[DATA_AXIS]})")
    res0 = cfg.model.layers[0].resolution
    C_in = cfg.model.in_channels
    if C_in and feats is None:
        raise ValueError(f"cfg.model.in_channels={C_in} requires "
                         f"feats [B, N, {C_in}]")

    # per-scene host-side partitioning, identical to the 1-D path; ONE
    # static capacity (the max need) so shapes agree across scenes
    parts = []
    caps_needed = []
    for b in range(B):
        origin, vsize = grid_bounds(jnp.asarray(scenes_xyz[b])[None],
                                    jnp.asarray(masks[b])[None], res0)
        origin = np.asarray(origin)[0]
        vsize = np.asarray(vsize)[0]
        halo = resident_halo(cfg, vsize)
        caps_needed.append(suggest_capacity(scenes_xyz[b], masks[b], Ds,
                                            halo))
        parts.append((origin, vsize, halo))
    cap = capacity if capacity is not None else max(caps_needed)

    sxs, sms, sidxs, edges_l, origins, extents = [], [], [], [], [], []
    sfs = []
    for b in range(B):
        origin, vsize, halo = parts[b]
        sx, sm, owned, sidx, edges = partition_scene(
            scenes_xyz[b], masks[b], Ds, halo, cap)
        sxs.append(sx)
        sms.append(sm)
        sidxs.append((sidx, owned))
        edges_l.append(edges)
        origins.append(origin)
        extents.append(vsize * res0 / (1.0 + 1e-5))
        if C_in:
            sfs.append(np.asarray(feats[b], np.float32)[sidx]
                       * sm[..., None].astype(np.float32))

    per_scene = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    variables = jax.device_put(variables, rep)
    if fwd is None:
        fwd = make_resident_ml_forward(cfg, mesh, ghost_cap=ghost_cap,
                                       axis_name=SPACE_AXIS,
                                       batch_axis=DATA_AXIS)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    rngs = jax.device_put(jax.random.split(rng, B), data_sh)
    args = [jax.device_put(np.stack(sxs), per_scene)]
    if C_in:
        args.append(jax.device_put(np.stack(sfs), per_scene))
    args.append(jax.device_put(np.stack(sms), per_scene))
    lg, overflow = fwd(variables, *args,
                       jax.device_put(np.stack(edges_l), data_sh),
                       jax.device_put(np.stack(origins), data_sh),
                       jax.device_put(np.stack(extents), data_sh),
                       rngs)
    logits = fetch_global(lg)
    n_over = int(fetch_global(overflow).sum())
    if n_over:
        import warnings
        warnings.warn(
            f"resident-ml scenes: {n_over} boundary rows overflowed the "
            f"per-face ghost buffer (ghost_cap); raise ghost_cap",
            RuntimeWarning, stacklevel=2)

    C = logits.shape[-1]
    out = np.zeros((B, N, C), logits.dtype)
    for b in range(B):
        sidx, owned = sidxs[b]
        flat = owned.reshape(-1)
        out[b][sidx.reshape(-1)[flat]] = logits[b].reshape(-1, C)[flat]
    return out

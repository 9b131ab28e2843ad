"""F-22 spatial sharding: partition/stitch invariants, halo-plane exchange,
and sharded whole-scene inference on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gridgcn_tpu.configs import presets
from gridgcn_tpu.models.build import init_model
from gridgcn_tpu.parallel.mesh import DATA_AXIS, make_mesh
from gridgcn_tpu.parallel.spatial import (
    exchange_halo_planes, partition_scene, sharded_scene_apply)


def test_partition_covers_each_point_once():
    rng = np.random.default_rng(0)
    N = 2000
    xyz = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    mask[1500:] = False
    sx, sm, owned, sidx, edges = partition_scene(xyz, mask, n_shards=4,
                                                 halo=0.5, capacity=1200)
    assert edges.shape == (5,) and edges[0] == -np.inf
    # every valid point owned exactly once
    owned_idx = sidx[owned]
    assert sorted(owned_idx.tolist()) == sorted(np.nonzero(mask)[0].tolist())
    # halo points duplicate across shards but are never owned twice
    assert owned.sum() == mask.sum()
    # shard points match originals
    for d in range(4):
        sel = sm[d]
        np.testing.assert_allclose(sx[d][sel], xyz[sidx[d][sel]])
    # halo coverage: every non-owned point lies within `halo` of its slab's
    # edges, and every valid point within halo of an interior edge appears in
    # both adjacent shards
    valid_x = xyz[mask][:, 0]
    edges = np.linspace(valid_x.min(), valid_x.max(), 5)
    for d in range(4):
        halo_pts = sx[d][sm[d] & ~owned[d], 0]
        if len(halo_pts):
            assert (halo_pts >= edges[d] - 0.5 - 1e-5).all()
            assert (halo_pts <= edges[d + 1] + 0.5 + 1e-5).all()


def test_halo_plane_exchange():
    mesh = make_mesh(8)
    W, R = 4, 6   # each shard holds a [W, R] slab of a [32, R] global array
    glob = jnp.arange(32 * R, dtype=jnp.float32).reshape(32, R)

    @jax.jit
    def run(g):
        def f(local):
            lg, rg = exchange_halo_planes(local, DATA_AXIS)
            return jnp.concatenate([lg, local, rg], axis=0)
        return shard_map(f, mesh=mesh, in_specs=P(DATA_AXIS, None),
                         out_specs=P(DATA_AXIS, None))(g)

    out = np.asarray(run(glob)).reshape(8, W + 2, R)
    g = np.asarray(glob).reshape(8, W, R)
    for d in range(8):
        np.testing.assert_array_equal(out[d, 1:-1], g[d])
        if d > 0:
            np.testing.assert_array_equal(out[d, 0], g[d - 1, -1])
        else:
            np.testing.assert_array_equal(out[d, 0], 0)
        if d < 7:
            np.testing.assert_array_equal(out[d, -1], g[d + 1, 0])
        else:
            np.testing.assert_array_equal(out[d, -1], 0)


def test_sharded_scene_inference_runs():
    """Whole-scene seg inference across 8 shards: every point predicted."""
    cfg = presets.get("synthetic_tiny_seg")
    model, variables = init_model(cfg)
    mesh = make_mesh(8)

    rng = np.random.default_rng(3)
    N = 1600
    xyz = rng.uniform(0, 4, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)

    fwd = jax.jit(lambda x, m: model.apply(
        variables, x, None, m, train=False,
        rngs={"cagq": jax.random.PRNGKey(0)}))
    logits = sharded_scene_apply(fwd, xyz, mask, mesh, halo=0.8,
                                 capacity=1024,
                                 num_outputs=cfg.model.num_classes)
    assert logits.shape == (N, cfg.model.num_classes)
    assert np.isfinite(logits).all()
    # no point left with an all-zero row (every owned point got a prediction)
    assert (np.abs(logits).sum(axis=1) > 0).all()


def test_resident_forward_covers_and_is_finite():
    """F-22 tier 2: fully-resident sharded forward — every valid point gets
    a finite prediction, stitched in original order."""
    import jax
    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.resident import resident_seg_predict

    cfg = presets.get("synthetic_tiny_seg")   # layers[0] 64 centers % 4 == 0
    _, variables = init_model(cfg)
    mesh = make_mesh(4)

    rng = np.random.default_rng(3)
    N = 512
    xyz = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    mask[480:] = False

    logits = resident_seg_predict(cfg, variables, xyz, mask, mesh,
                                  capacity=N, rng=jax.random.PRNGKey(7))
    assert logits.shape == (N, cfg.model.num_classes)
    assert np.isfinite(logits).all()
    # every owned valid point got a real prediction (logits not all-zero);
    # invalid points stay zero
    assert (np.abs(logits[:480]).sum(-1) > 0).mean() > 0.99
    assert np.abs(logits[480:]).sum() == 0.0


def test_resident_forward_trainable():
    """Gradients flow through the all_gather and sharded stages."""
    import jax
    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.ops.voxelize import grid_bounds
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.resident import (
        make_resident_forward, resident_halo)
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = presets.get("synthetic_tiny_seg")
    _, variables = init_model(cfg)
    mesh = make_mesh(4)
    fwd = make_resident_forward(cfg, mesh)

    rng = np.random.default_rng(4)
    N = 256
    xyz = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None],
                                cfg.model.layers[0].resolution)
    from gridgcn_tpu.parallel.spatial import partition_scene
    sx, sm, owned, _, edges = partition_scene(
        xyz, mask, 4, resident_halo(cfg, np.asarray(vsize)[0]), capacity=N)

    sh = NamedSharding(mesh, P("data"))
    sxd, smd = jax.device_put(sx, sh), jax.device_put(sm, sh)
    key = jax.random.PRNGKey(0)

    def loss(params):
        v = {**variables, "params": params}
        logits = fwd(v, sxd, smd, jnp.asarray(edges),
                     jnp.asarray(origin)[0], jnp.asarray(vsize)[0], key)
        return jnp.sum(jnp.where(jnp.asarray(owned)[..., None],
                                 logits.astype(jnp.float32) ** 2, 0.0))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)


def test_exchange_boundary_ships_band_rows():
    """F-22 tier 3: owned rows within `width` of a slab face arrive in the
    neighbor's ghost buffer (left-neighbor rows first), ends zeroed."""
    from jax import shard_map
    from gridgcn_tpu.parallel.resident_ml import exchange_boundary

    mesh = make_mesh(4)
    M, H, C = 16, 4, 2
    # shard d owns [d, d+1); one point at d+0.05 (left band), one at
    # d+0.95 (right band), rest mid-slab
    xs = []
    for d in range(4):
        x = np.full((M,), d + 0.5, np.float32)
        x[0], x[1] = d + 0.05, d + 0.95
        xs.append(x)
    xyz = np.zeros((4, M, 3), np.float32)
    xyz[:, :, 0] = np.stack(xs)
    feat = np.arange(4 * M * C, dtype=np.float32).reshape(4, M, C)
    valid = np.ones((4, M), bool)
    edges = jnp.arange(5, dtype=jnp.float32)

    def f(x, ft, v, e):
        d = jax.lax.axis_index(DATA_AXIS)
        g_xyz, g_feat, g_ok, _, dropped = exchange_boundary(
            x[0], ft[0], v[0], e[d], e[d + 1], 0.2, H, DATA_AXIS)
        assert dropped.shape == ()
        return g_xyz[None], g_feat[None], g_ok[None]

    g_xyz, g_feat, g_ok = jax.jit(shard_map(
        f, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS),) * 3))(xyz, feat, valid, edges)
    g_xyz, g_feat, g_ok = map(np.asarray, (g_xyz, g_feat, g_ok))

    for d in range(4):
        left, right = g_ok[d, :H], g_ok[d, H:]
        if d > 0:   # left neighbor's right-band point (x = d-1+0.95)
            assert left.sum() == 1
            np.testing.assert_allclose(g_xyz[d, :H][left][0, 0], d - 0.05)
            np.testing.assert_allclose(g_feat[d, :H][left][0],
                                       feat[d - 1, 1])
        else:
            assert left.sum() == 0
        if d < 3:   # right neighbor's left-band point (x = d+1+0.05)
            assert right.sum() == 1
            np.testing.assert_allclose(g_xyz[d, H:][right][0, 0],
                                       d + 1.05)
            np.testing.assert_allclose(g_feat[d, H:][right][0],
                                       feat[d + 1, 0])
        else:
            assert right.sum() == 0


def test_resident_ml_forward_covers_and_is_finite():
    """F-22 tier 3: fully-sharded multi-level forward — every owned valid
    point gets a finite prediction, stitched in original order."""
    from gridgcn_tpu.parallel.resident_ml import resident_ml_seg_predict

    cfg = presets.get("synthetic_tiny_seg")   # 64/16 centers, % 4 == 0
    _, variables = init_model(cfg)
    mesh = make_mesh(4)

    rng = np.random.default_rng(5)
    N = 512
    xyz = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    mask[480:] = False

    logits = resident_ml_seg_predict(cfg, variables, xyz, mask, mesh,
                                     capacity=N, rng=jax.random.PRNGKey(7))
    assert logits.shape == (N, cfg.model.num_classes)
    assert np.isfinite(logits).all()
    assert (np.abs(logits[:480]).sum(-1) > 0).mean() > 0.99
    assert np.abs(logits[480:]).sum() == 0.0


def test_resident_ml_forward_trainable():
    """Gradients flow through the per-layer ppermute halo exchanges."""
    from jax.sharding import NamedSharding
    from gridgcn_tpu.ops.voxelize import grid_bounds
    from gridgcn_tpu.parallel.resident import resident_halo
    from gridgcn_tpu.parallel.resident_ml import make_resident_ml_forward

    cfg = presets.get("synthetic_tiny_seg")
    _, variables = init_model(cfg)
    mesh = make_mesh(4)
    fwd = make_resident_ml_forward(cfg, mesh)

    rng = np.random.default_rng(6)
    N = 256
    xyz = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None],
                                cfg.model.layers[0].resolution)
    extent = np.asarray(vsize)[0] * cfg.model.layers[0].resolution \
        / (1.0 + 1e-5)
    sx, sm, owned, _, edges = partition_scene(
        xyz, mask, 4, resident_halo(cfg, np.asarray(vsize)[0]), capacity=N)

    sh = NamedSharding(mesh, P(DATA_AXIS))
    sxd, smd = jax.device_put(sx, sh), jax.device_put(sm, sh)
    key = jax.random.PRNGKey(0)

    def loss(params):
        v = {**variables, "params": params}
        logits, _ = fwd(v, sxd, smd, jnp.asarray(edges),
                        jnp.asarray(origin)[0], jnp.asarray(extent), key)
        return jnp.sum(jnp.where(jnp.asarray(owned)[..., None],
                                 logits.astype(jnp.float32) ** 2, 0.0))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)


# ---------------------------------------------------------------------------
# Value equivalence: sharded tiers vs the single-device forward (VERDICT r1
# next-round #2; contract tightened per VERDICT r2 #4). CAGQ center sampling
# is seed- and shard-local by design, so bitwise equality across tiers is not
# defined; the contract has two parts:
#
#   STATISTICAL — on a trained model over a 16,384-point scene split into 8
#   slabs, vote-averaged owned-point predictions from each tier must agree
#   with single-device vote-averaged predictions at least as well as two
#   independent single-device vote rounds agree with each other (minus a
#   small slack) — asserted globally AND restricted to the boundary band
#   (points within one level-0 context reach of an interior slab face), the
#   only region where the tiers differ from single-device. Labels are
#   decorrelated from slab geometry (asymmetric x-range keeps the x=0 class
#   boundary off every slab face; the y-class boundary is orthogonal to the
#   partition axis). Mutation tests prove the band metric actually fails
#   when a halo is truncated.
#
#   BITWISE — the tier-3 protocol's own claim (parallel/resident_ml.py
#   docstring): after each decoder ghost refresh, every ghost row's features
#   ARE the owner's values. Asserted exactly, both at the primitive level
#   and inside the real jitted forward via debug_capture.
# ---------------------------------------------------------------------------

SCENE_N = 16_384
SCENE_SHARDS = 8


def _scene_cfg():
    """synthetic_tiny_seg scaled to scene resolution: grids fine enough that
    every level's context reach fits inside one of 8 slabs — the locality
    assumption the adjacent-neighbor ghost exchange is built on — and the
    boundary band (one level-0 reach around the 7 interior faces) covers
    <50% of the scene, so the band metric is strictly sharper than global
    agreement."""
    import dataclasses
    base = presets.get("synthetic_tiny_seg")
    layers = (
        dataclasses.replace(base.model.layers[0], resolution=64, nv=8,
                            n_centers=512, k_neighbors=16),
        dataclasses.replace(base.model.layers[1], resolution=32, nv=8,
                            n_centers=128, k_neighbors=8),
    )
    up_layers = (
        dataclasses.replace(base.model.up_layers[0], resolution=32),
        dataclasses.replace(base.model.up_layers[1], resolution=64),
    )
    model = dataclasses.replace(base.model, layers=layers,
                                up_layers=up_layers)
    data = dataclasses.replace(base.data, num_points=2048, batch_size=4)
    return dataclasses.replace(base, name="scene_equiv", model=model,
                               data=data)


@pytest.fixture(scope="module")
def trained_seg_setup():
    from gridgcn_tpu.data.pipeline import make_dataset
    from gridgcn_tpu.parallel.spatial import _slab_edges
    from gridgcn_tpu.train.steps import create_train_state, make_train_step

    cfg = _scene_cfg()
    model, variables = init_model(cfg)
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "seg")
    state = create_train_state(cfg, model, variables,
                               ds.steps_per_epoch(cfg.data.batch_size))
    step = make_train_step(cfg, model, donate=False)
    rng = jax.random.PRNGKey(0)
    for epoch in range(3):
        for batch in ds.batches(cfg.data.batch_size, seed=epoch):
            state, m = step(state, {k: jnp.asarray(v)
                                    for k, v in batch.items()}, rng)
    assert float(m["acc"]) > 0.8, "seg model failed to train for equivalence test"
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # one synthetic scene, quadrant labels (same rule as the train set) —
    # x-range asymmetric so the x=0 label boundary sits 0.1 away from the
    # nearest slab face (faces at -0.9 + k/4) instead of ON one
    rng_np = np.random.default_rng(42)
    N = SCENE_N
    xyz = rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                         size=(N, 3)).astype(np.float32)
    labels = ((xyz[:, 0] > 0).astype(np.int32) * 2
              + (xyz[:, 1] > 0).astype(np.int32)) % cfg.model.num_classes
    mask = np.ones(N, bool)

    # boundary band: within one level-0 context reach of an interior face
    edges = _slab_edges(xyz[:, 0], SCENE_SHARDS)
    extent = float(xyz[:, 0].max() - xyz[:, 0].min())
    reach0 = ((cfg.model.layers[0].context // 2 + 1)
              * extent / cfg.model.layers[0].resolution)
    interior = np.asarray(edges[1:-1], np.float32)
    band = (np.abs(xyz[:, 0:1] - interior[None, :]) < reach0).any(axis=1)
    band_frac = float(band.mean())
    assert 0.05 < band_frac < 0.5, (
        f"band covers {band_frac:.2f} of the scene — not a sharper metric")

    fwd = jax.jit(lambda x, m, k: model.apply(
        variables, x, None, m, train=False, rngs={"cagq": k}))

    def single_device_votes(seed0, votes=6):
        acc = None
        for v in range(votes):
            lg = np.asarray(fwd(xyz[None], mask[None],
                                jax.random.PRNGKey(seed0 + v)))[0]
            acc = lg if acc is None else acc + lg
        return acc

    ref = single_device_votes(0)
    ref2 = single_device_votes(1000)
    rp, rp2 = ref.argmax(-1), ref2.argmax(-1)
    self_agree = float(np.mean(rp == rp2))
    band_self_agree = float(np.mean(rp[band] == rp2[band]))
    band_self_dist = float(np.linalg.norm((ref2 - ref)[band])
                           / (np.linalg.norm(ref[band]) + 1e-9))
    ref_acc = float(np.mean(rp == labels))
    assert ref_acc > 0.85, f"single-device scene acc only {ref_acc}"
    return dict(cfg=cfg, variables=variables, xyz=xyz, labels=labels,
                mask=mask, ref=ref, self_agree=self_agree, ref_acc=ref_acc,
                band=band, band_self_agree=band_self_agree,
                band_self_dist=band_self_dist, edges=edges)


def _equiv_report(logits, setup):
    """(global agreement, band agreement, band logit distance, accuracy)
    of `logits` vs the single-device reference. The band logit distance —
    relative L2 of the vote-averaged logits over boundary-band points —
    is the sharpest of the three: boundary corruption moves logits even
    when the argmax survives (measured: ghost-starved tier 3 sits at
    1.85× the self-distance while its band agreement drops only 4%)."""
    pred = logits.argmax(-1)
    ref_pred = setup["ref"].argmax(-1)
    band = setup["band"]
    band_dist = float(np.linalg.norm((logits - setup["ref"])[band])
                      / (np.linalg.norm(setup["ref"][band]) + 1e-9))
    return (float(np.mean(pred == ref_pred)),
            float(np.mean(pred[band] == ref_pred[band])),
            band_dist,
            float(np.mean(pred == setup["labels"])))


def _check_equiv(name, logits, setup, slack=0.05):
    agree, band_agree, band_dist, acc = _equiv_report(logits, setup)
    floor = setup["self_agree"] - slack
    band_floor = setup["band_self_agree"] - slack
    dist_ceil = 1.5 * setup["band_self_dist"]
    assert agree >= floor, (
        f"{name}: argmax agreement with single-device {agree:.4f} below "
        f"single-device self-agreement floor {floor:.4f}")
    assert band_agree >= band_floor, (
        f"{name}: BOUNDARY-BAND agreement {band_agree:.4f} below band "
        f"self-agreement floor {band_floor:.4f} — slab-face-local error")
    assert band_dist <= dist_ceil, (
        f"{name}: boundary-band logit distance {band_dist:.4f} above "
        f"1.5x the single-device self-distance {dist_ceil:.4f}")
    assert abs(acc - setup["ref_acc"]) <= slack, (
        f"{name}: accuracy {acc:.4f} vs single-device {setup['ref_acc']:.4f}")


def _tier1_votes(s, halo, capacity, votes=6, seed0=2000):
    model, _ = init_model(s["cfg"])
    acc = None
    mesh = make_mesh(SCENE_SHARDS)
    for v in range(votes):
        key = jax.random.PRNGKey(seed0 + v)
        fwd = jax.jit(lambda x, m, k=key: model.apply(
            s["variables"], x, None, m, train=False, rngs={"cagq": k}))
        lg = sharded_scene_apply(fwd, s["xyz"], s["mask"], mesh, halo=halo,
                                 capacity=capacity,
                                 num_outputs=s["cfg"].model.num_classes)
        acc = lg if acc is None else acc + lg
    return acc


def _tier1_capacity(s, halo):
    from gridgcn_tpu.parallel.spatial import suggest_capacity
    return suggest_capacity(s["xyz"], s["mask"], SCENE_SHARDS, halo)


def test_tier1_slab_equivalence(trained_seg_setup):
    """Tier 1 (slab + full-receptive-field halo re-run) ≡ single device."""
    from gridgcn_tpu.parallel.spatial import required_halo

    s = trained_seg_setup
    halo = required_halo(s["cfg"], float(np.ptp(s["xyz"], axis=0).max()))
    acc = _tier1_votes(s, halo, _tier1_capacity(s, halo))
    _check_equiv("tier1", acc, s)


# Mutation study, recorded negative result (r3): truncating the TIER-1 halo
# to halo/50 does NOT move this model's outputs (band agreement 0.9735 vs
# self 0.9758; band logit distance 0.0953 vs self 0.0870) — the quadrant
# task is decidable from per-point xyz, so a slab-local re-run of the full
# network stays correct without any halo at all. No statistical contract
# can detect a mutation that leaves outputs unchanged; the sensitivity
# proof for the band metric therefore anchors on the tier-3 ghost protocol
# (test_boundary_band_detects_starved_ghost_cap, measured separation
# 1.85x), and tier-3 protocol bugs are additionally caught structurally by
# the bitwise ghost tests below.


def test_tier2_resident_equivalence(trained_seg_setup):
    """Tier 2 (dense-sharded / coarse-replicated) ≡ single device."""
    from gridgcn_tpu.parallel.resident import (
        make_resident_forward, resident_seg_predict)

    s = trained_seg_setup
    cfg, xyz, mask = s["cfg"], s["xyz"], s["mask"]
    mesh = make_mesh(SCENE_SHARDS)
    fwd = make_resident_forward(cfg, mesh)
    acc = None
    for v in range(6):
        lg = resident_seg_predict(cfg, s["variables"], xyz, mask, mesh,
                                  rng=jax.random.PRNGKey(3000 + v), fwd=fwd)
        acc = lg if acc is None else acc + lg
    _check_equiv("tier2", acc, s)


def test_tier3_resident_ml_equivalence(trained_seg_setup):
    """Tier 3 (every level sharded, ppermute feature halos) ≡ single device."""
    from gridgcn_tpu.parallel.resident_ml import (
        make_resident_ml_forward, resident_ml_seg_predict)

    s = trained_seg_setup
    cfg, xyz, mask = s["cfg"], s["xyz"], s["mask"]
    mesh = make_mesh(SCENE_SHARDS)
    fwd = make_resident_ml_forward(cfg, mesh)
    acc = None
    for v in range(6):
        lg = resident_ml_seg_predict(cfg, s["variables"], xyz, mask, mesh,
                                     rng=jax.random.PRNGKey(4000 + v),
                                     fwd=fwd)
        acc = lg if acc is None else acc + lg
    _check_equiv("tier3", acc, s)


def test_scene_batched_api_error_paths():
    """make_mesh2d / predict_scenes fail loudly on misuse: over-sized
    meshes, a 1-D mesh where a 2-D one is needed, scene counts that do
    not divide the data axis, missing features, and train mode on the
    batched forward."""
    import dataclasses

    import pytest as _pytest

    from gridgcn_tpu.parallel.mesh import make_mesh2d
    from gridgcn_tpu.parallel.resident_ml import (
        make_resident_ml_forward, resident_ml_seg_predict_scenes)

    cfg = presets.get("synthetic_tiny_seg")
    with _pytest.raises(ValueError, match="devices are available"):
        make_mesh2d(4, 4)                    # 16 > 8 fake devices
    mesh2d = make_mesh2d(2, 4)
    mesh1d = make_mesh(4)

    xyz = np.zeros((2, 64, 3), np.float32)
    masks = np.ones((2, 64), bool)
    with _pytest.raises(ValueError, match="mesh"):
        resident_ml_seg_predict_scenes(cfg, {}, xyz, masks, mesh1d)
    with _pytest.raises(ValueError, match="not divisible"):
        resident_ml_seg_predict_scenes(cfg, {}, xyz[:1], masks[:1], mesh2d)
    cfg_f = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, in_channels=2))
    with _pytest.raises(ValueError, match="feats"):
        resident_ml_seg_predict_scenes(cfg_f, {}, xyz, masks, mesh2d)
    with _pytest.raises(ValueError, match="debug_capture"):
        make_resident_ml_forward(cfg, mesh2d, batch_axis="data",
                                 debug_capture=True)
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batches)
    with _pytest.raises(ValueError, match="tier-3"):
        make_spatial_train_step(cfg, mesh2d, tier="resident",
                                batch_axis="data")
    labels = np.zeros((2, 64), np.int32)
    with _pytest.raises(ValueError, match="mesh"):
        shard_scene_batches(cfg, xyz, labels, masks, mesh1d)
    with _pytest.raises(ValueError, match="not divisible"):
        shard_scene_batches(cfg, xyz[:1], labels[:1], masks[:1], mesh2d)


def test_scene_batched_tier3_matches_per_scene(trained_seg_setup):
    """VERDICT r4 #7: scene-batch DP composed with tier-3 spatial sharding
    on a 2-D (data=2 × space=4) mesh reproduces the per-scene 1-D tier-3
    outputs scene for scene — the pod-scale deployment shape (scenes ride
    the data axis, each scene's voxel slabs ride its own 4-chip ring)."""
    from gridgcn_tpu.parallel.mesh import make_mesh2d
    from gridgcn_tpu.parallel.resident_ml import (
        resident_ml_seg_predict, resident_ml_seg_predict_scenes)

    s = trained_seg_setup
    cfg = s["cfg"]
    rng_np = np.random.default_rng(77)
    N = 4096
    scenes = np.stack([
        rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                       size=(N, 3)).astype(np.float32) for _ in range(2)])
    masks = np.ones((2, N), bool)

    # shared static capacity: the per-point RNG bit draw is shaped by the
    # padded capacity, so it must be identical in both paths
    key = jax.random.PRNGKey(5)
    keys = jax.random.split(key, 2)
    mesh1d = make_mesh(4)
    per_scene = [resident_ml_seg_predict(cfg, s["variables"], scenes[b],
                                         masks[b], mesh1d, capacity=N,
                                         rng=keys[b])
                 for b in range(2)]

    mesh2d = make_mesh2d(2, 4)
    batched = resident_ml_seg_predict_scenes(cfg, s["variables"], scenes,
                                             masks, mesh2d, capacity=N,
                                             rng=key)
    assert batched.shape == (2, N, cfg.model.num_classes)
    for b in range(2):
        np.testing.assert_allclose(batched[b], per_scene[b],
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"scene {b}: 2-D mesh output "
                                           f"diverges from per-scene tier 3")


def test_scene_batched_tier3_train_grads_match_per_scene(trained_seg_setup):
    """Round-5 train-side composition: the gradient of a pooled
    owned-masked CE through the scene-batched (2 scenes × 4 slabs) tier-3
    TRAIN forward equals the gradient of the SAME pooled loss computed
    from two per-scene 1-D tier-3 train forwards — scene-batch DP and
    spatial sharding compose for training, not just eval. BN batch stats
    must merge to the mean of the per-scene ring-merged stats."""
    import optax

    from gridgcn_tpu.parallel.mesh import SPACE_AXIS, make_mesh2d
    from gridgcn_tpu.parallel.resident_ml import make_resident_ml_forward
    from gridgcn_tpu.parallel.spatial_train import (
        shard_scene_batch, shard_scene_batches)

    s = trained_seg_setup
    cfg = s["cfg"]
    nc = cfg.model.num_classes
    rng_np = np.random.default_rng(78)
    N = 4096
    scenes = np.stack([
        rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                       size=(N, 3)).astype(np.float32) for _ in range(2)])
    labels = (((scenes[..., 0] > 0) * 2
               + (scenes[..., 1] > 0)) % nc).astype(np.int32)
    masks = np.ones((2, N), bool)
    bstats = s["variables"]["batch_stats"]

    key = jax.random.PRNGKey(9)
    keys = jax.random.split(key, 2)

    def pooled_ce(logits, lbl, owned):
        lg = logits.astype(jnp.float32)
        ce = optax.softmax_cross_entropy(
            lg, jax.nn.one_hot(lbl, nc, dtype=lg.dtype))
        w = owned.astype(ce.dtype)
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-6)

    # --- per-scene 1-D train forwards, loss pooled across both scenes ---
    mesh1d = make_mesh(4)
    fwd1 = make_resident_ml_forward(cfg, mesh1d, train=True)
    b1 = [shard_scene_batch(cfg, scenes[b], labels[b], masks[b], mesh1d, N)
          for b in range(2)]

    def loss_1d(params):
        tot_ce, tot_w, stats_l = 0.0, 0.0, []
        for b in range(2):
            v = {"params": params, "batch_stats": bstats}
            lg, _, st = fwd1(v, b1[b]["sx"], b1[b]["sm"], b1[b]["edges"],
                             b1[b]["origin"], b1[b]["extent"], keys[b])
            lg = lg.astype(jnp.float32)
            ce = optax.softmax_cross_entropy(
                lg, jax.nn.one_hot(b1[b]["label"], nc, dtype=lg.dtype))
            w = b1[b]["owned"].astype(ce.dtype)
            tot_ce = tot_ce + jnp.sum(ce * w)
            tot_w = tot_w + jnp.sum(w)
            stats_l.append(st)
        stats = jax.tree.map(lambda a, b_: (a + b_) / 2, *stats_l)
        return tot_ce / jnp.maximum(tot_w, 1e-6), stats

    (loss1, stats1), g1 = jax.value_and_grad(loss_1d, has_aux=True)(
        s["variables"]["params"])

    # --- scene-batched 2-D train forward, same pooled loss ---
    mesh2d = make_mesh2d(2, 4)
    fwd2 = make_resident_ml_forward(cfg, mesh2d, train=True,
                                    axis_name=SPACE_AXIS,
                                    batch_axis=DATA_AXIS)
    b2 = shard_scene_batches(cfg, scenes, labels, masks, mesh2d, N)

    def loss_2d(params):
        v = {"params": params, "batch_stats": bstats}
        lg, overflow, st = fwd2(v, b2["sx"], b2["sm"], b2["edges"],
                                b2["origin"], b2["extent"], keys)
        return pooled_ce(lg, b2["label"], b2["owned"]), (st, overflow)

    (loss2, (stats2, overflow)), g2 = jax.value_and_grad(
        loss_2d, has_aux=True)(s["variables"]["params"])

    assert int(np.asarray(overflow).sum()) == 0
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-5,
            err_msg="scene-batched tier-3 TRAIN gradient diverges from "
                    "the pooled per-scene 1-D gradient"),
        g2, g1)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6,
            err_msg="batched BN stat merge != mean of per-scene stats"),
        stats2, stats1)


def test_boundary_band_detects_starved_ghost_cap(trained_seg_setup):
    """Mutation check (VERDICT r2 #4): tier 3 with ghost_cap=1 (≈ no ghosts
    shipped) must fail the boundary-band logit-distance gate — stale/zero
    ghosts corrupt predictions near slab faces, and the band metric has to
    see it. Measured separation: starved ≈ 1.85× the self-distance vs
    healthy ≈ 1.24× against the 1.5× ceiling `_check_equiv` enforces."""
    import warnings

    from gridgcn_tpu.parallel.resident_ml import (
        make_resident_ml_forward, resident_ml_seg_predict)

    s = trained_seg_setup
    cfg, xyz, mask = s["cfg"], s["xyz"], s["mask"]
    mesh = make_mesh(SCENE_SHARDS)
    fwd = make_resident_ml_forward(cfg, mesh, ghost_cap=1)
    acc = None
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for v in range(6):
            lg = resident_ml_seg_predict(
                cfg, s["variables"], xyz, mask, mesh, ghost_cap=1,
                rng=jax.random.PRNGKey(4000 + v), fwd=fwd)
            acc = lg if acc is None else acc + lg
    _, band_agree, band_dist, _ = _equiv_report(acc, s)
    dist_ceil = 1.5 * s["band_self_dist"]
    assert band_dist > dist_ceil, (
        f"ghost-starved tier 3 passed the band logit-distance gate "
        f"({band_dist:.4f} <= {dist_ceil:.4f}) — the contract is toothless")
    # argmax agreement also visibly degrades (2x more in the band than
    # globally), even if it alone would need a tighter slack to gate on
    assert band_agree < s["band_self_agree"] - 0.02


def test_ghost_refresh_bitwise_roundtrip():
    """The refresh primitive's exactness claim, asserted bitwise: for every
    ghost row exchange_boundary delivered, refresh_ghosts lands the owner's
    UPDATED feature row byte-for-byte (ppermute moves bytes; no arithmetic
    touches the payload)."""
    from gridgcn_tpu.parallel.resident_ml import (
        exchange_boundary, refresh_ghosts)

    mesh = make_mesh(4)
    M, H, C = 32, 8, 5
    rng = np.random.default_rng(11)
    xs = np.concatenate([rng.uniform(d, d + 1, (1, M)) for d in range(4)])
    xyz = np.zeros((4, M, 3), np.float32)
    xyz[:, :, 0] = xs
    feat = rng.normal(size=(4, M, C)).astype(np.float32)
    valid = rng.uniform(size=(4, M)) > 0.1
    edges = jnp.arange(5, dtype=jnp.float32)

    def f(x, ft, v, e):
        d = jax.lax.axis_index(DATA_AXIS)
        g_xyz, _, g_ok, send, _ = exchange_boundary(
            x[0], ft[0], v[0], e[d], e[d + 1], 0.3, H, DATA_AXIS)
        upd = jnp.sin(ft[0] * 3.0) + x[0][:, :1]   # "decoder update"
        g_new = refresh_ghosts(upd, send, DATA_AXIS)
        return g_xyz[None], g_new[None], g_ok[None], upd[None]

    g_xyz, g_new, g_ok, upd = map(np.asarray, jax.jit(shard_map(
        f, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS),) * 4))(xyz, feat, valid, edges))

    # index every shard's updated rows by the bitwise xyz key
    owners = {}
    for d in range(4):
        for r in range(M):
            if valid[d, r]:
                owners[xyz[d, r].tobytes()] = upd[d, r]
    n_ghosts = 0
    for d in range(4):
        for r in np.nonzero(g_ok[d])[0]:
            key = g_xyz[d, r].tobytes()
            assert key in owners, "ghost row has no owner — fabricated data"
            np.testing.assert_array_equal(g_new[d, r], owners[key])
            n_ghosts += 1
    assert n_ghosts > 0, "no ghosts exchanged — test scene degenerate"


def test_tier3_ghost_refresh_bitwise_in_forward(trained_seg_setup):
    """The protocol claim asserted INSIDE the real jitted tier-3 forward
    (debug_capture): after every decoder ghost refresh, each valid ghost
    row's features are byte-identical to the owning shard's row for the
    same (bitwise-matched) position."""
    from jax.sharding import NamedSharding
    from gridgcn_tpu.ops.voxelize import grid_bounds
    from gridgcn_tpu.parallel.resident import resident_halo
    from gridgcn_tpu.parallel.resident_ml import make_resident_ml_forward
    from gridgcn_tpu.parallel.spatial import suggest_capacity

    s = trained_seg_setup
    cfg, xyz, mask = s["cfg"], s["xyz"], s["mask"]
    D = SCENE_SHARDS
    mesh = make_mesh(D)

    res0 = cfg.model.layers[0].resolution
    origin, vsize = grid_bounds(jnp.asarray(xyz)[None],
                                jnp.asarray(mask)[None], res0)
    origin = np.asarray(origin)[0]
    extent = np.asarray(vsize)[0] * res0 / (1.0 + 1e-5)
    halo = resident_halo(cfg, np.asarray(vsize)[0])
    cap = suggest_capacity(xyz, mask, D, halo)
    sx, sm, _, _, edges = partition_scene(xyz, mask, D, halo, cap)

    fwd = make_resident_ml_forward(cfg, mesh, debug_capture=True)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    _, overflow, captures = fwd(
        jax.device_put(s["variables"], NamedSharding(mesh, P())),
        jax.device_put(sx, sh), jax.device_put(sm, sh),
        jnp.asarray(edges), jnp.asarray(origin), jnp.asarray(extent),
        jax.random.PRNGKey(9))
    assert int(np.asarray(overflow).sum()) == 0
    assert captures, "no ghost-carrying decode stages captured"

    total_ghosts = 0
    for stage, (c_xyz, c_feat, c_valid, c_owned) in enumerate(captures):
        c_xyz, c_feat, c_valid, c_owned = map(
            np.asarray, (c_xyz, c_feat, c_valid, c_owned))
        owners = {}
        for d in range(D):
            for r in np.nonzero(c_valid[d] & c_owned[d])[0]:
                owners[c_xyz[d, r].tobytes()] = (d, r)
        ghosts = c_valid & ~c_owned
        for d in range(D):
            for r in np.nonzero(ghosts[d])[0]:
                key = c_xyz[d, r].tobytes()
                assert key in owners, (
                    f"stage {stage} shard {d}: ghost row {r} matches no "
                    f"owned row on any shard")
                od, orow = owners[key]
                assert od != d
                np.testing.assert_array_equal(
                    c_feat[d, r], c_feat[od, orow],
                    err_msg=(f"stage {stage}: ghost ({d},{r}) != owner "
                             f"({od},{orow}) — refresh not bitwise exact"))
                total_ghosts += 1
    assert total_ghosts > 0, "no ghosts present — scene degenerate"


def test_spatial_training_learns_and_is_deterministic(tmp_path):
    """F-22 fully-resident spatially-sharded TRAINING via the train CLI path:
    owned-masked loss over the tier-2 forward on a 4-device mesh learns the
    quadrant task, and a re-run with the same seed is bit-identical."""
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.train.train import train_spatial

    cfg = presets.get("synthetic_tiny_seg")

    def run(tag):
        c = apply_overrides(cfg, {
            "train.epochs": 2, "train.ckpt_dir": str(tmp_path / tag),
            "data.num_points": 512, "train.lr": 3e-3,
        })
        return train_spatial(c, mesh_devices=4,
                             log_path=str(tmp_path / f"{tag}.jsonl"))

    state = run("a")
    # learning signal: final owned-point train accuracy beats 4-class chance
    import json
    lines = [json.loads(l) for l in open(tmp_path / "a.jsonl")]
    epochs = [l for l in lines if l.get("kind") == "epoch"]
    assert epochs and epochs[-1]["acc"] > 0.6, epochs
    # BN stats actually updated (train-mode forward ran)
    leaves = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)

    state_b = run("b")
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_spatial_training_tier3(tmp_path):
    """Tier-3 (resident-ml) spatially-sharded training: one epoch runs,
    loss is finite, and BN statistics update through the ppermute halos."""
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.train.train import train_spatial

    cfg = presets.get("synthetic_tiny_seg")
    cfg = apply_overrides(cfg, {
        "train.epochs": 1, "train.ckpt_dir": str(tmp_path / "ck3"),
        "data.num_points": 512, "train.lr": 3e-3,
    })
    state = train_spatial(cfg, mesh_devices=4,
                          log_path=str(tmp_path / "t3.jsonl"),
                          tier="resident_ml")
    import json
    lines = [json.loads(l) for l in open(tmp_path / "t3.jsonl")]
    ep = [l for l in lines if l.get("kind") == "epoch"]
    assert ep and np.isfinite(ep[-1]["loss"])
    leaves = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)


def test_spatial_training_scene_batched_cli(tmp_path):
    """`train.py --spatial resident-ml --scene-batch 2` drives the 2-D
    (2 scenes × 4 slabs) composed training loop end-to-end: epoch metrics
    are finite, BN stats update, and the guard rails reject misuse."""
    import json

    import pytest as _pytest

    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.train.train import train_spatial

    cfg = presets.get("synthetic_tiny_seg")
    cfg = apply_overrides(cfg, {
        "train.epochs": 1, "train.ckpt_dir": str(tmp_path / "ck2d"),
        "data.num_points": 512, "train.lr": 3e-3,
    })
    with _pytest.raises(ValueError, match="tier-3"):
        train_spatial(cfg, mesh_devices=8, tier="resident",
                      scene_batch=2)
    with _pytest.raises(ValueError, match="divide"):
        train_spatial(cfg, mesh_devices=8, tier="resident_ml",
                      scene_batch=3)
    state = train_spatial(cfg, mesh_devices=8,
                          log_path=str(tmp_path / "t2d.jsonl"),
                          tier="resident_ml", scene_batch=2)
    lines = [json.loads(l) for l in open(tmp_path / "t2d.jsonl")]
    ep = [l for l in lines if l.get("kind") == "epoch"]
    assert ep and np.isfinite(ep[-1]["loss"])
    leaves = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)

    # determinism (H6): a same-seed re-run of the scene-batched loop is
    # bit-identical — the per-scene key split and the fixed drop-last
    # grouping are both seed-derived, so checkpoints stay comparable
    cfg_b = apply_overrides(cfg, {"train.ckpt_dir": str(tmp_path / "ckb")})
    state_b = train_spatial(cfg_b, mesh_devices=8,
                            tier="resident_ml", scene_batch=2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg="scene-batched spatial training not deterministic"),
        jax.device_get(state.params), jax.device_get(state_b.params))


def test_spatial_training_augmented(tmp_path):
    """F-14 augmentation in the spatial loop: `train_spatial` applies the
    same jitted `augment_batch` op set to the WHOLE scene before
    `partition_scene` (rotation precedes the slab cut). Asserts the
    augmented loop (a) runs with finite loss on both the per-scene and
    scene-batched branches, (b) is seed-deterministic, and (c) actually
    perturbs training — params differ from the unaugmented run."""
    import json

    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.train.train import train_spatial

    cfg0 = presets.get("synthetic_tiny_seg")

    def run(tag, augment, **kw):
        c = apply_overrides(cfg0, {
            "train.epochs": 1, "train.ckpt_dir": str(tmp_path / tag),
            "data.num_points": 512, "train.lr": 3e-3,
            "data.augment": augment,
        })
        return train_spatial(c, log_path=str(tmp_path / f"{tag}.jsonl"),
                             **kw)

    state = run("aug_a", True, mesh_devices=4, tier="resident_ml")
    lines = [json.loads(l) for l in open(tmp_path / "aug_a.jsonl")]
    ep = [l for l in lines if l.get("kind") == "epoch"]
    assert ep and np.isfinite(ep[-1]["loss"])

    # determinism: the aug key is derived from (seed, epoch, scene)
    state_b = run("aug_b", True, mesh_devices=4, tier="resident_ml")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg="augmented spatial training not deterministic"),
        jax.device_get(state.params), jax.device_get(state_b.params))

    # augmentation actually changed the data the model saw
    state_off = run("aug_off", False, mesh_devices=4, tier="resident_ml")
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.params), jax.device_get(state_off.params))
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

    # scene-batched branch takes the same pre-partition augment
    state_sb = run("aug_sb", True, mesh_devices=8, tier="resident_ml",
                   scene_batch=2)
    lines = [json.loads(l) for l in open(tmp_path / "aug_sb.jsonl")]
    ep = [l for l in lines if l.get("kind") == "epoch"]
    assert ep and np.isfinite(ep[-1]["loss"])


def test_spatial_training_tier3_featured_learns_and_needs_features():
    """VERDICT r4 #3: featured (in_channels > 0) spatially-sharded TRAINING
    gets executable evidence — the train-side twin of
    test_tier3_featured_equivalence. An in_channels=2 config trains
    SPATIALLY (tier 3, calibrated ghost caps) on the feature-decided task:

      (a) owned-point accuracy learns past 4-class chance,
      (b) the ghost-overflow counter stays 0 under the CALIBRATED caps,
      (c) a step fed ZEROED features scores ~chance — proof the sharded
          feature partition (`sf`) actually reaches the loss, so a
          plumbing bug that drops/misaligns features cannot pass.
    """
    import dataclasses

    from gridgcn_tpu.parallel.resident_ml import calibrate_ghost_cap
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batch)
    from gridgcn_tpu.train.steps import create_train_state

    base = _scene_cfg()
    cfg = dataclasses.replace(
        base, name="feat_spatial_train",
        model=dataclasses.replace(base.model, in_channels=2),
        data=dataclasses.replace(base.data, num_feats=2))
    model, variables = init_model(cfg)
    D = 4
    mesh = make_mesh(D)
    N = cfg.data.num_points

    def make_scene(rng_np):
        xyz = rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                             size=(N, 3)).astype(np.float32)
        feat = rng_np.uniform(-1, 1, size=(N, 2)).astype(np.float32)
        labels = (2 * (feat[:, 0] > 0).astype(np.int32)
                  + (feat[:, 1] > 0).astype(np.int32))
        return xyz, feat, labels

    rng_np = np.random.default_rng(11)
    scenes = [make_scene(rng_np) for _ in range(8)]
    mask = np.ones(N, bool)

    caps = calibrate_ghost_cap(cfg, scenes[0][0], mask, D)
    # the calibration must be a real reduction on the dense level, not the
    # full-share fallback (uniform scenes: band fraction ~ width/slab)
    assert caps[0] < max(8, cfg.model.layers[0].n_centers // D)

    state = create_train_state(cfg, model, variables, steps_per_epoch=8)
    step = make_spatial_train_step(cfg, mesh, tier="resident_ml",
                                   ghost_cap=caps)
    rng = jax.random.PRNGKey(3)
    m = None
    for _ in range(6):
        for xyz, feat, labels in scenes:
            batch = shard_scene_batch(cfg, xyz, labels, mask, mesh, N,
                                      feat=feat)
            state, m = step(state, batch, rng)
            assert int(m["ghost_overflow"]) == 0, (
                "calibrated ghost caps overflowed during featured training")
    assert float(m["acc"]) > 0.7, (
        f"featured spatial training stuck at acc={float(m['acc'])}")

    # (c) mutation: zeroed features → the metrics of the NEXT step (computed
    # on pre-update params) collapse to ~4-class chance
    xyz, feat, labels = scenes[0]
    batch0 = shard_scene_batch(cfg, xyz, labels, mask, mesh, N,
                               feat=np.zeros_like(feat))
    _, m0 = step(state, batch0, rng)
    assert float(m0["acc"]) < 0.5, (
        f"zeroed features still score {float(m0['acc']):.3f} — featured "
        f"spatial TRAINING cannot detect feature-plumbing bugs")


def test_scene_batched_tier3_spatial_training_learns():
    """Round-5 composition, end-to-end: scene-batched spatial TRAINING on
    a 2-D (2 scenes × 4 slabs) mesh — two whole scenes per optimizer step,
    each sharded over its own 4-device ring — learns the feature-decided
    task past chance with zero ghost overflow, and collapses to chance on
    zeroed features (the batched twin of the featured 1-D train gate)."""
    import dataclasses

    from gridgcn_tpu.parallel.mesh import DATA_AXIS as _DA, make_mesh2d
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batches)
    from gridgcn_tpu.train.steps import create_train_state

    base = _scene_cfg()
    cfg = dataclasses.replace(
        base, name="feat_spatial_train_2d",
        model=dataclasses.replace(base.model, in_channels=2),
        data=dataclasses.replace(base.data, num_feats=2))
    model, variables = init_model(cfg)
    mesh2d = make_mesh2d(2, 4)
    N = cfg.data.num_points

    rng_np = np.random.default_rng(23)

    def make_scene():
        xyz = rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                             size=(N, 3)).astype(np.float32)
        feat = rng_np.uniform(-1, 1, size=(N, 2)).astype(np.float32)
        labels = (2 * (feat[:, 0] > 0).astype(np.int32)
                  + (feat[:, 1] > 0).astype(np.int32))
        return xyz, feat, labels

    scenes = [make_scene() for _ in range(8)]
    masks = np.ones((2, N), bool)

    state = create_train_state(cfg, model, variables, steps_per_epoch=4)
    step = make_spatial_train_step(cfg, mesh2d, tier="resident_ml",
                                   batch_axis=_DA)
    rng = jax.random.PRNGKey(7)
    m = None
    for _ in range(6):
        for g in range(0, 8, 2):
            xyz2 = np.stack([scenes[g][0], scenes[g + 1][0]])
            feat2 = np.stack([scenes[g][1], scenes[g + 1][1]])
            lab2 = np.stack([scenes[g][2], scenes[g + 1][2]])
            batch = shard_scene_batches(cfg, xyz2, lab2, masks, mesh2d,
                                        N, feats=feat2)
            state, m = step(state, batch, rng)
            assert int(m["ghost_overflow"]) == 0
    assert float(m["acc"]) > 0.7, (
        f"scene-batched featured spatial training stuck at "
        f"acc={float(m['acc'])}")

    # mutation: zeroed features → next step's metrics ~4-class chance
    xyz2 = np.stack([scenes[0][0], scenes[1][0]])
    lab2 = np.stack([scenes[0][2], scenes[1][2]])
    batch0 = shard_scene_batches(cfg, xyz2, lab2, masks, mesh2d, N,
                                 feats=np.zeros((2, N, 2), np.float32))
    _, m0 = step(state, batch0, rng)
    assert float(m0["acc"]) < 0.5, (
        f"zeroed features still score {float(m0['acc']):.3f} on the "
        f"scene-batched path — feature plumbing untested")


def test_spatial_training_updates_every_bn_running_stat():
    """Round-5 regression gate for a bug the preset-scale spatial
    convergence run exposed: a mutable flax apply returns the FULL
    batch_stats collection (stale values for modules the called method
    did not touch), so merging per-call returns let the LAST call's stale
    entries overwrite every earlier update — only the head BN's running
    stats ever reached the train state, train-mode metrics looked healthy
    (BN normalizes with batch stats), and held-out eval with running
    stats read CHANCE (measured 0.254 vs 0.772 batch-stats on the chip).
    Asserts (a) every BN running stat moves off init under BOTH spatial
    tiers, and (b) a spatially-trained model evaluated monolithically
    with train=False (running stats) beats chance."""
    import dataclasses

    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batch)
    from gridgcn_tpu.train.steps import create_train_state

    base = presets.get("synthetic_tiny_seg")
    cfg = dataclasses.replace(
        base, data=dataclasses.replace(base.data, num_points=512))
    N = 512
    rng_np = np.random.default_rng(5)
    xyz = rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                         size=(N, 3)).astype(np.float32)
    labels = (((xyz[:, 0] > 0) * 2 + (xyz[:, 1] > 0))
              % cfg.model.num_classes).astype(np.int32)
    mask = np.ones(N, bool)
    mesh = make_mesh(4)

    for tier in ("resident", "resident_ml"):
        model, variables = init_model(cfg)
        init_stats = jax.device_get(variables["batch_stats"])
        state = create_train_state(cfg, model, variables, 8)
        step = make_spatial_train_step(cfg, mesh, tier=tier)
        batch = shard_scene_batch(cfg, xyz, labels, mask, mesh, N)
        for _ in range(60):
            state, m = step(state, batch, jax.random.PRNGKey(0))
        new_stats = jax.device_get(state.batch_stats)

        frozen = []

        def walk(a, b, path=""):
            if isinstance(a, dict):
                for k in sorted(a):
                    walk(a[k], b[k], path + "/" + k)
            elif np.allclose(a, b):
                frozen.append(path)

        walk(init_stats, new_stats)
        assert not frozen, (
            f"tier {tier}: BN running stats frozen at init for {frozen} — "
            f"the per-call mutable merge is dropping updates again")

        # running-stats eval (train=False) must beat 4-class chance
        lg = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(xyz)[None], None, jnp.ones((1, N), bool),
            train=False, rngs={"cagq": jax.random.PRNGKey(1)})
        acc = float((jnp.argmax(lg[0], -1) == jnp.asarray(labels)).mean())
        assert acc > 0.5, (
            f"tier {tier}: running-stats eval at {acc:.3f} (~chance) — "
            f"spatially-trained models are broken under train=False")


def test_suggest_capacity_bounds_partition():
    """Auto-sized capacity admits every slab's own+halo occupancy (the two
    share one _slab_edges rule) while staying well under the whole-scene
    size for spread-out scenes."""
    from gridgcn_tpu.parallel.spatial import partition_scene, suggest_capacity

    rng = np.random.default_rng(3)
    N, D, halo = 40_000, 8, 0.05
    xyz = rng.uniform(0, 8, (N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    cap = suggest_capacity(xyz, mask, D, halo, round_to=256)
    # partition must fit (raises on overflow) …
    sx, sm, owned, sidx, _ = partition_scene(xyz, mask, D, halo, cap)
    assert int(owned.sum()) == N
    # … and the auto size must actually be resident-sized, not scene-sized
    assert cap < N // 2


# ---------------------------------------------------------------------------
# Featured input (in_channels > 0) through the resident tiers (VERDICT r3 #2)
#
# The S3DIS config carries 6 per-point feature channels (SURVEY §2.3 F-13);
# round 3's resident tiers were xyz-only. These gates train a model whose
# LABELS are decided by the input features, so any plumbing bug that drops,
# zeroes, or misaligns features in the sharded input partition collapses
# accuracy to chance — mutation sensitivity is built into the task (and
# asserted directly by the zeroed-feature run below).
# ---------------------------------------------------------------------------

FEAT_N = 8192
FEAT_SHARDS = 8


@pytest.fixture(scope="module")
def trained_feat_seg_setup():
    import dataclasses

    from gridgcn_tpu.train.steps import create_train_state, make_train_step

    base = _scene_cfg()
    cfg = dataclasses.replace(
        base, name="feat_equiv",
        model=dataclasses.replace(base.model, in_channels=2),
        data=dataclasses.replace(base.data, num_feats=2))
    model, variables = init_model(cfg)

    def make_scene(rng_np, n):
        xyz = rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                             size=(n, 3)).astype(np.float32)
        feat = rng_np.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        labels = (2 * (feat[:, 0] > 0).astype(np.int32)
                  + (feat[:, 1] > 0).astype(np.int32))
        return xyz, feat, labels

    rng_np = np.random.default_rng(7)
    S, Np = 32, cfg.data.num_points
    scenes = [make_scene(rng_np, Np) for _ in range(S)]
    state = create_train_state(cfg, model, variables, S // 4)
    step = make_train_step(cfg, model, donate=False)
    rng = jax.random.PRNGKey(0)
    for epoch in range(4):
        for b in range(0, S, cfg.data.batch_size):
            chunk = scenes[b: b + cfg.data.batch_size]
            batch = {
                "xyz": jnp.asarray(np.stack([c[0] for c in chunk])),
                "feat": jnp.asarray(np.stack([c[1] for c in chunk])),
                "label": jnp.asarray(np.stack([c[2] for c in chunk])),
                "mask": jnp.ones((len(chunk), Np), bool),
            }
            state, m = step(state, batch, rng)
    assert float(m["acc"]) > 0.8, (
        f"feature-labeled seg model failed to train: acc={float(m['acc'])}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    xyz, feat, labels = make_scene(np.random.default_rng(99), FEAT_N)
    mask = np.ones(FEAT_N, bool)

    fwd = jax.jit(lambda x, f, m, k: model.apply(
        variables, x, f, m, train=False, rngs={"cagq": k}))

    def single_device_votes(seed0, votes=4):
        acc = None
        for v in range(votes):
            lg = np.asarray(fwd(xyz[None], feat[None], mask[None],
                                jax.random.PRNGKey(seed0 + v)))[0]
            acc = lg if acc is None else acc + lg
        return acc

    ref = single_device_votes(0)
    ref2 = single_device_votes(1000)
    self_agree = float(np.mean(ref.argmax(-1) == ref2.argmax(-1)))
    ref_acc = float(np.mean(ref.argmax(-1) == labels))
    assert ref_acc > 0.9, f"single-device featured acc only {ref_acc}"
    return dict(cfg=cfg, variables=variables, xyz=xyz, feat=feat,
                labels=labels, mask=mask, ref=ref, self_agree=self_agree,
                ref_acc=ref_acc)


def _feat_check(name, logits, s, slack=0.05):
    agree = float(np.mean(logits.argmax(-1) == s["ref"].argmax(-1)))
    acc = float(np.mean(logits.argmax(-1) == s["labels"]))
    assert agree >= s["self_agree"] - slack, (
        f"{name}: agreement {agree:.4f} below self-agreement floor "
        f"{s['self_agree'] - slack:.4f}")
    assert abs(acc - s["ref_acc"]) <= slack, (
        f"{name}: accuracy {acc:.4f} vs single-device {s['ref_acc']:.4f}")


def test_tier2_featured_equivalence(trained_feat_seg_setup):
    """Tier 2 with in_channels=2 ≡ single device on a feature-decided task."""
    from gridgcn_tpu.parallel.resident import (
        make_resident_forward, resident_seg_predict)

    s = trained_feat_seg_setup
    mesh = make_mesh(FEAT_SHARDS)
    fwd = make_resident_forward(s["cfg"], mesh)
    acc = None
    for v in range(4):
        lg = resident_seg_predict(s["cfg"], s["variables"], s["xyz"],
                                  s["mask"], mesh, feat=s["feat"],
                                  rng=jax.random.PRNGKey(5000 + v), fwd=fwd)
        acc = lg if acc is None else acc + lg
    _feat_check("tier2-featured", acc, s)


def test_tier3_featured_equivalence(trained_feat_seg_setup):
    """Tier 3 with in_channels=2 ≡ single device, and the gate has teeth:
    the same forward fed ZEROED features collapses to chance accuracy —
    proof the sharded input partition actually carries the features."""
    from gridgcn_tpu.parallel.resident_ml import (
        make_resident_ml_forward, resident_ml_seg_predict)

    s = trained_feat_seg_setup
    mesh = make_mesh(FEAT_SHARDS)
    fwd = make_resident_ml_forward(s["cfg"], mesh)
    acc = None
    for v in range(4):
        lg = resident_ml_seg_predict(s["cfg"], s["variables"], s["xyz"],
                                     s["mask"], mesh, feat=s["feat"],
                                     rng=jax.random.PRNGKey(6000 + v),
                                     fwd=fwd)
        acc = lg if acc is None else acc + lg
    _feat_check("tier3-featured", acc, s)

    # mutation: zeroed features must collapse accuracy to ~4-class chance
    lg0 = resident_ml_seg_predict(s["cfg"], s["variables"], s["xyz"],
                                  s["mask"], mesh,
                                  feat=np.zeros_like(s["feat"]),
                                  rng=jax.random.PRNGKey(6000), fwd=fwd)
    acc0 = float(np.mean(lg0.argmax(-1) == s["labels"]))
    assert acc0 < 0.5, (
        f"zeroed features still score {acc0:.3f} — the featured gate "
        f"cannot detect feature-plumbing bugs")


def test_scene_batched_tier3_featured_matches_per_scene(
        trained_feat_seg_setup):
    """The FEATURED branch of the 2-D-mesh scene batch (VERDICT r4 #7 ∘
    r3 #2): two feature-carrying scenes on a (2 × 4) mesh reproduce the
    per-scene 1-D tier-3 outputs — features ride the per-scene spatial
    partition under the batch vmap."""
    from gridgcn_tpu.parallel.mesh import make_mesh2d
    from gridgcn_tpu.parallel.resident_ml import (
        resident_ml_seg_predict, resident_ml_seg_predict_scenes)

    s = trained_feat_seg_setup
    cfg = s["cfg"]
    rng_np = np.random.default_rng(31)
    N = 2048
    scenes, feats = [], []
    for _ in range(2):
        scenes.append(rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                                     size=(N, 3)).astype(np.float32))
        feats.append(rng_np.uniform(-1, 1, size=(N, 2)).astype(np.float32))
    scenes, feats = np.stack(scenes), np.stack(feats)
    masks = np.ones((2, N), bool)

    key = jax.random.PRNGKey(9)
    keys = jax.random.split(key, 2)
    mesh1d = make_mesh(4)
    per_scene = [resident_ml_seg_predict(cfg, s["variables"], scenes[b],
                                         masks[b], mesh1d, capacity=N,
                                         rng=keys[b], feat=feats[b])
                 for b in range(2)]
    batched = resident_ml_seg_predict_scenes(
        cfg, s["variables"], scenes, masks, make_mesh2d(2, 4),
        capacity=N, rng=key, feats=feats)
    for b in range(2):
        np.testing.assert_allclose(batched[b], per_scene[b],
                                   rtol=1e-5, atol=1e-5)


def test_resident_predict_requires_feat_when_configured():
    """in_channels > 0 without feat must fail loudly, not silently zero."""
    import dataclasses

    from gridgcn_tpu.parallel.resident_ml import resident_ml_seg_predict

    base = _scene_cfg()
    cfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model, in_channels=2))
    model, variables = init_model(cfg)
    mesh = make_mesh(FEAT_SHARDS)
    xyz = np.random.default_rng(0).uniform(
        -1, 1, size=(1024, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="in_channels"):
        resident_ml_seg_predict(cfg, variables, xyz, np.ones(1024, bool),
                                mesh)


# ---------------------------------------------------------------------------
# Context-dependent equivalence task (VERDICT r3 #4, SURVEY §4.2 #5)
#
# The quadrant task above is decidable from per-point xyz, so a tier-1
# halo truncation or a tier-2 assembly corruption that destroys boundary
# CONTEXT leaves its outputs unchanged (recorded negative above). This
# task removes that blind spot: labels are LOCAL DENSITY classes —
# background (0), sparse blob (1), dense blob (2) — with blob centers
# random per scene, so a point's class is decidable ONLY from its
# neighborhood within ~one context reach. Mutations that corrupt boundary
# context must now flip the gates, and the tests below prove they do.
# ---------------------------------------------------------------------------

DENSE_BLOB, SPARSE_BLOB = 192, 24
BLOB_SIGMA = 0.05
# ONE scale for training and eval scenes: local density is the label
# signal, and blob-internal density is fixed by (BLOB_SIGMA, points/blob)
# while background density scales with n over the fixed domain — scenes of
# different n are therefore DIFFERENT tasks (measured: a model trained at
# n=2048 scores 0.40 on an n=16384 scene vs 0.67 in-distribution)
DENSITY_N = 4096


def _density_scene(rng_np, n):
    """~half blob points in Gaussian clusters of two sharply different
    densities (192 vs 24 points at the same sigma — per-voxel coverage
    ~6x apart), rest uniform background. Returns (xyz [n,3], labels [n])
    shuffled."""
    parts, labels = [], []
    for pts, lab in ((DENSE_BLOB, 2), (SPARSE_BLOB, 1)):
        count = max(1, n // 4 // pts)
        centers = rng_np.uniform((-0.8, -0.9, -0.9), (1.0, 0.9, 0.9),
                                 size=(count, 3))
        blob = (centers[:, None, :] + BLOB_SIGMA
                * rng_np.standard_normal((count, pts, 3))).reshape(-1, 3)
        parts.append(blob)
        labels.append(np.full(len(blob), lab, np.int32))
    nb = sum(len(p) for p in parts)
    parts.append(rng_np.uniform((-0.9, -1, -1), (1.1, 1, 1),
                                size=(n - nb, 3)))
    labels.append(np.zeros(n - nb, np.int32))
    xyz = np.concatenate(parts).astype(np.float32)
    labels = np.concatenate(labels)
    perm = rng_np.permutation(n)
    return xyz[perm], labels[perm]


@pytest.fixture(scope="module")
def trained_density_seg_setup():
    import dataclasses

    from gridgcn_tpu.parallel.spatial import _slab_edges
    from gridgcn_tpu.train.steps import create_train_state, make_train_step

    base = _scene_cfg()
    # denser center sampling than the quadrant config: per-point density
    # classification needs decoder resolution (1 layer-1 center per ~4
    # points, like the original _scene_cfg ratio at its native N)
    layers = (dataclasses.replace(base.model.layers[0], n_centers=1024),
              dataclasses.replace(base.model.layers[1], n_centers=256))
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, layers=layers),
        data=dataclasses.replace(base.data, num_points=DENSITY_N,
                                 batch_size=2))
    model, variables = init_model(cfg)
    rng_np = np.random.default_rng(17)
    S, Np = 12, DENSITY_N
    scenes = [_density_scene(rng_np, Np) for _ in range(S)]
    state = create_train_state(cfg, model, variables, S // 2)
    step = make_train_step(cfg, model, donate=False)
    rng = jax.random.PRNGKey(0)
    for epoch in range(10):
        for b in range(0, S, cfg.data.batch_size):
            chunk = scenes[b: b + cfg.data.batch_size]
            batch = {
                "xyz": jnp.asarray(np.stack([c[0] for c in chunk])),
                "label": jnp.asarray(np.stack([c[1] for c in chunk])),
                "mask": jnp.ones((len(chunk), Np), bool),
            }
            state, m = step(state, batch, rng)
    assert float(m["acc"]) > 0.65, (
        f"density-task model failed to train: acc={float(m['acc'])}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    xyz, labels = _density_scene(np.random.default_rng(23), DENSITY_N)
    mask = np.ones(DENSITY_N, bool)

    edges = _slab_edges(xyz[:, 0], SCENE_SHARDS)
    extent = float(xyz[:, 0].max() - xyz[:, 0].min())
    reach0 = ((cfg.model.layers[0].context // 2 + 1)
              * extent / cfg.model.layers[0].resolution)
    interior = np.asarray(edges[1:-1], np.float32)
    band = (np.abs(xyz[:, 0:1] - interior[None, :]) < reach0).any(axis=1)

    fwd = jax.jit(lambda x, m, k: model.apply(
        variables, x, None, m, train=False, rngs={"cagq": k}))

    def votes_fn(seed0, votes=4):
        acc = None
        for v in range(votes):
            lg = np.asarray(fwd(xyz[None], mask[None],
                                jax.random.PRNGKey(seed0 + v)))[0]
            acc = lg if acc is None else acc + lg
        return acc

    ref, ref2 = votes_fn(0), votes_fn(1000)
    rp, rp2 = ref.argmax(-1), ref2.argmax(-1)
    ref_acc = float(np.mean(rp == labels))
    # per-point density classification has irreducible ambiguity at blob
    # fringes (a blob-edge point's neighborhood IS background-sparse);
    # measured 0.57 here (train 0.69) vs 0.52 majority class. The
    # equivalence gates are AGREEMENT-relative, so absolute accuracy only
    # anchors the ±slack check — what matters is that predictions depend
    # on neighborhood context, which the mutation flips below prove.
    assert ref_acc > 0.5, f"single-device density acc only {ref_acc}"
    return dict(cfg=cfg, variables=variables, xyz=xyz, labels=labels,
                mask=mask, ref=ref,
                self_agree=float(np.mean(rp == rp2)),
                band_self_agree=float(np.mean(rp[band] == rp2[band])),
                band_self_dist=float(np.linalg.norm((ref2 - ref)[band])
                                     / (np.linalg.norm(ref[band]) + 1e-9)),
                ref_acc=ref_acc, band=band, edges=edges)


def test_tier1_density_equivalence_and_halo_mutation(trained_density_seg_setup):
    """On the context-decided task, tier 1 with the required halo passes
    the gates AND a truncated halo now FAILS them — the sensitivity proof
    the quadrant task could not provide (its recorded negative above)."""
    from gridgcn_tpu.parallel.spatial import required_halo

    s = trained_density_seg_setup
    halo = required_halo(s["cfg"], float(np.ptp(s["xyz"], axis=0).max()))
    acc = _tier1_votes(s, halo, _tier1_capacity(s, halo), votes=4)
    _check_equiv("tier1-density", acc, s)

    bad_halo = halo / 50
    acc_bad = _tier1_votes(s, bad_halo, _tier1_capacity(s, halo), votes=4,
                           seed0=2000)
    _, band_agree, band_dist, _ = _equiv_report(acc_bad, s)
    dist_ceil = 1.5 * s["band_self_dist"]
    # measured separation: truncated 1.85x self vs healthy 1.37x against
    # the 1.5x ceiling — the gate the quadrant task could never flip
    assert band_dist > dist_ceil, (
        f"truncated tier-1 halo passed the band logit-distance gate "
        f"({band_dist:.4f} <= {dist_ceil:.4f}) on the density task — "
        f"the tier-1 contract is still toothless")
    assert band_agree < s["band_self_agree"] - 0.01, (
        f"truncated halo did not move band agreement "
        f"({band_agree:.4f} vs self {s['band_self_agree']:.4f})")


def test_tier2_density_equivalence_and_mutations(trained_density_seg_setup):
    """Tier 2 passes on the context-decided task, and a mis-assembled
    all_gather (feature rows rolled off their positions) flips the gate —
    measured at 4.8x the self-distance / 0.67 agreement vs 0.98 self.

    Recorded negative (mirrors the tier-1 quadrant negative above):
    starving the tier-2 INPUT halo (halo=1e-3) does NOT move outputs even
    on this context-decided task (band dist 0.96x self) — tier 2's
    boundary context flows through the all_gathered coarse pyramid, which
    a thin input halo cannot corrupt; only layer-0's K-neighbor gathers
    near faces degrade, below this model's noise floor. The contract that
    has teeth for assembly bugs is the corrupt-gather mutation below."""
    from gridgcn_tpu.parallel.resident import (
        make_resident_forward, resident_seg_predict)

    s = trained_density_seg_setup
    cfg, xyz, mask = s["cfg"], s["xyz"], s["mask"]
    mesh = make_mesh(SCENE_SHARDS)

    def votes_of(fwd, votes=4):
        acc = None
        for v in range(votes):
            lg = resident_seg_predict(cfg, s["variables"], xyz, mask, mesh,
                                      rng=jax.random.PRNGKey(3000 + v),
                                      fwd=fwd)
            acc = lg if acc is None else acc + lg
        return acc

    _check_equiv("tier2-density", votes_of(make_resident_forward(cfg, mesh)),
                 s)

    # mutation: mis-assembled gather — features roll off their centers
    acc_g = votes_of(make_resident_forward(cfg, mesh, _corrupt_gather=True))
    agree, _, band_dist, _ = _equiv_report(acc_g, s)
    assert agree < s["self_agree"] - 0.05, (
        f"corrupt-gather tier 2 passed the agreement gate ({agree:.4f} vs "
        f"floor {s['self_agree'] - 0.05:.4f})")
    assert band_dist > 1.5 * s["band_self_dist"]


def test_tier3_density_equivalence(trained_density_seg_setup):
    """Tier 3 also holds on the context-decided task (its own mutation
    proof — ghost starvation — lives above)."""
    from gridgcn_tpu.parallel.resident_ml import (
        make_resident_ml_forward, resident_ml_seg_predict)

    s = trained_density_seg_setup
    mesh = make_mesh(SCENE_SHARDS)
    fwd = make_resident_ml_forward(s["cfg"], mesh)
    acc = None
    for v in range(4):
        lg = resident_ml_seg_predict(s["cfg"], s["variables"], s["xyz"],
                                     s["mask"], mesh,
                                     rng=jax.random.PRNGKey(4000 + v),
                                     fwd=fwd)
        acc = lg if acc is None else acc + lg
    _check_equiv("tier3-density", acc, s)

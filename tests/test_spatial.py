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
        g_xyz, g_feat, g_ok, _ = exchange_boundary(
            x[0], ft[0], v[0], e[d], e[d + 1], 0.2, H, DATA_AXIS)
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
        logits = fwd(v, sxd, smd, jnp.asarray(edges),
                     jnp.asarray(origin)[0], jnp.asarray(extent), key)
        return jnp.sum(jnp.where(jnp.asarray(owned)[..., None],
                                 logits.astype(jnp.float32) ** 2, 0.0))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)

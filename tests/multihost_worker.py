"""Worker script for the F-19/F-22 multi-host smoke tests (SURVEY §2.4:
multi-host over DCN via jax.distributed). Launched twice on localhost by
tests/test_multihost.py with coordinator env vars; each process contributes
2 virtual CPU devices, the global mesh spans all 4, and (a) one
data-parallel train step runs on the tiny synthetic config, (b) when
TIER3_GOLDEN is set, the tier-3 spatially-sharded whole-scene forward runs
on the same global mesh — its ppermute ghost ring crossing the process
boundary — and the stitched logits are compared against a single-process
golden. With TIER3_MODE=golden (no coordinator env), the script instead
runs single-process on 4 fake devices and WRITES the golden."""

import os
import sys


def tier3_logits():
    """Deterministic tier-3 whole-scene forward on a 4-device mesh (global
    in the 2-process run, local in golden mode): synthetic_tiny_seg at
    random init, seeded scene, votes=1. Same code both modes — the only
    difference is whether the 4 devices span one process or two."""
    import jax
    import numpy as np

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.resident_ml import resident_ml_seg_predict

    cfg = presets.get("synthetic_tiny_seg")
    cfg = apply_overrides(cfg, {"data.num_points": 512})
    model, variables = init_model(cfg)
    # host-local numpy trees: committed single-device arrays cannot be
    # device_put onto a mesh with non-addressable devices
    variables = jax.device_get(variables)
    rng = np.random.default_rng(1234)
    xyz = rng.uniform(0, 4, size=(512, 3)).astype(np.float32)
    labels = rng.integers(0, cfg.model.num_classes, 512).astype(np.int32)
    mask = np.ones(512, bool)
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    logits = resident_ml_seg_predict(cfg, variables, xyz, mask, mesh,
                                     rng=jax.random.PRNGKey(7))

    # one tier-3 spatially-sharded TRAIN step on the same mesh: the
    # gradient psum and BN pmean also cross the process boundary in the
    # 2-process run
    from gridgcn_tpu.parallel.mesh import replicate_tree
    from gridgcn_tpu.parallel.spatial_train import (
        make_spatial_train_step, shard_scene_batch)
    from gridgcn_tpu.train.steps import create_train_state

    state = jax.device_get(
        create_train_state(cfg, model, variables, steps_per_epoch=4))
    batch = shard_scene_batch(cfg, xyz, labels, mask, mesh, 512)
    step = make_spatial_train_step(cfg, mesh, tier="resident_ml")
    _, m = step(replicate_tree(state, mesh),
                batch, replicate_tree(jax.random.PRNGKey(3), mesh))

    # the 2-D composition (F-19 ∘ F-22): 2 scenes × 2 slabs on the same 4
    # devices — in the 2-process run each scene's spatial ring and the
    # cross-scene batch axis both cross the process boundary
    from gridgcn_tpu.parallel.mesh import make_mesh2d
    from gridgcn_tpu.parallel.resident_ml import (
        resident_ml_seg_predict_scenes)

    xyz2 = rng.uniform(0, 4, size=(512, 3)).astype(np.float32)
    scenes = np.stack([xyz, xyz2])
    masks = np.ones((2, 512), bool)
    logits2d = resident_ml_seg_predict_scenes(
        cfg, variables, scenes, masks, make_mesh2d(2, 2),
        rng=jax.random.PRNGKey(11))
    return logits, logits2d, float(m["loss"]), float(m["acc"])


def golden_main(path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    logits, logits2d, loss, acc = tier3_logits()
    np.savez(path, logits=logits, logits2d=logits2d, loss=loss, acc=acc)
    print("golden: OK", flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gridgcn_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())          # global
    assert len(jax.local_devices()) == 2, len(jax.local_devices())

    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.data.pipeline import make_dataset
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.dp import make_parallel_train_step
    from gridgcn_tpu.parallel.mesh import make_mesh, replicate_tree
    from gridgcn_tpu.train.steps import create_train_state

    cfg = presets.get("synthetic_tiny")
    cfg = apply_overrides(cfg, {"data.batch_size": 8,
                                "data.num_points": 128})
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables, steps_per_epoch=4)
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "cls")
    batch = next(ds.batches(cfg.data.batch_size, seed=0))

    mesh = make_mesh()          # all 4 global devices
    assert mesh.devices.size == 4

    # multi-host batch staging: each process owns its local shard of the
    # global batch (make_array_from_process_local_data handles the split)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridgcn_tpu.parallel.mesh import DATA_AXIS

    sh = NamedSharding(mesh, P(DATA_AXIS))
    gbatch = {k: jax.make_array_from_process_local_data(sh, v[
        jax.process_index() * 4:(jax.process_index() + 1) * 4])
        for k, v in batch.items()}

    step = make_parallel_train_step(cfg, model, mesh, donate=False)
    rng = jax.random.PRNGKey(0)
    new_state, metrics = step(replicate_tree(state, mesh), gbatch,
                              replicate_tree(rng, mesh))
    loss = float(metrics["loss"])
    assert loss == loss, "loss is NaN"
    assert int(new_state.step) == 1
    print(f"proc {jax.process_index()}: OK loss={loss:.4f}", flush=True)

    golden_path = os.environ.get("TIER3_GOLDEN")
    if golden_path:
        import numpy as np
        # F-22 over the process boundary: the tier-3 ppermute ghost ring
        # spans both processes' devices (slab 1↔2 neighbors live on
        # different processes); fetch_global all-gathers the stitched
        # logits back to every host. Must match the single-process golden.
        logits, logits2d, loss, acc = tier3_logits()
        golden = np.load(golden_path)
        np.testing.assert_allclose(logits, golden["logits"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(logits2d, golden["logits2d"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose([loss, acc],
                                   [golden["loss"], golden["acc"]],
                                   rtol=1e-5, atol=1e-6)
        print(f"proc {jax.process_index()}: TIER3 OK", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.environ.get("TIER3_MODE") == "golden":
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=4")
        golden_main(os.environ["TIER3_GOLDEN"])
    else:
        main()

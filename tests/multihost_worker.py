"""Worker script for the F-19 multi-host smoke test (SURVEY §2.4: multi-host
DP over DCN via jax.distributed). Launched twice on localhost by
tests/test_multihost.py with coordinator env vars; each process contributes
2 virtual CPU devices, the global mesh spans all 4, and one data-parallel
train step runs on the tiny synthetic config."""

import os
import sys


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


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()

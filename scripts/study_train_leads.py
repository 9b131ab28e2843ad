"""Train-step leads at TRAIN shapes (VERDICT r2 #7).

design.md §8/§10 parked two levers against the scannet_seg train step's
largest leaf (the 3.0 ms L1 winner-coords gather) and one global lever:

  * `coord_match` (combined [key|x|y|z] table + exact one-hot key-match
    einsum — bit-exact): studied at WHOLE-SCENE shapes, never at train
    shapes where the gather is 9% of the step.
  * mixed precision: `model.dtype=bfloat16` (~2 ms estimated).

This script times the full jitted train step (augment + CAGQ + fwd + bwd
+ Adam) for each variant on the real chip. Winners go into the presets
(`scannet_seg_bf16`) / a recorded negative result goes into design.md.

Usage: python scripts/study_train_leads.py [--iters 30]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp


def time_step(cfg, iters: int) -> float:
    from gridgcn_tpu.data.pipeline import make_dataset
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.train.steps import build_train_step, create_train_state

    model, variables = init_model(cfg)
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "seg")
    state = create_train_state(cfg, model, variables, 100)
    raw = build_train_step(cfg, model)

    @jax.jit
    def step(state, batch, rng):
        state, metrics = raw(state, batch, rng)
        return state, metrics["loss"]

    batch = {k: jnp.asarray(v) for k, v in
             next(ds.batches(cfg.data.batch_size, seed=0)).items()}
    rng = jax.random.PRNGKey(0)
    state, loss = step(state, batch, rng)
    assert bool(jnp.isfinite(jnp.asarray(float(loss)))), "loss not finite"
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch, rng)
    float(loss)
    return (time.perf_counter() - t0) / iters * 1e3


def variant(cfg, name, coord_match_layers=(), dtype=None):
    layers = tuple(
        dataclasses.replace(l, coord_match=(i in coord_match_layers))
        for i, l in enumerate(cfg.model.layers))
    m = dataclasses.replace(cfg.model, layers=layers)
    if dtype:
        m = dataclasses.replace(m, dtype=dtype)
    return name, dataclasses.replace(cfg, model=m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from gridgcn_tpu.configs import presets
    base = presets.get("scannet_seg")
    n_layers = len(base.model.layers)
    variants = [
        variant(base, "base (f32, gather)"),
        variant(base, "coord_match L0", (0,)),
        variant(base, "coord_match all", tuple(range(n_layers))),
        variant(base, "bf16", (), "bfloat16"),
        variant(base, "bf16 + coord_match L0", (0,), "bfloat16"),
    ]
    for name, cfg in variants:
        ms = time_step(cfg, args.iters)
        print(f"{name:28s} {ms:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

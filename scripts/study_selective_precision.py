"""Selective-precision bf16 training study (VERDICT r3 #1).

Round 3 measured blanket `model.dtype=bfloat16` at −7% step time but a
consistent ~0.015 held-out mIoU cost (paired 12-epoch synthetic_scene_seg
runs, seeds 0–2 — BASELINE.md round-3 notes), so the fast path stayed
opt-in. This study localizes the cost: the new `att_dtype` / `interp_dtype`
knobs keep the precision-sensitive islands (geometry encoding + attention
MLP/softmax; the decoder's inverse-distance accumulation) in f32 while the
FLOP-carrying edge/up/head MLPs stay bf16 (SURVEY §3.3 hot loops).

Two measurements per variant:
  * quality — paired 12-epoch `synthetic_scene_seg` runs per seed
    (identical protocol to the round-3 gate), held-out mIoU;
  * speed — the full jitted scannet_seg train step at crop shapes
    (identical protocol to scripts/study_train_leads.py).

Decision rule (VERDICT r3 next-round #1): a variant becomes the DEFAULT
scannet_seg iff paired mIoU delta vs f32 ≤ 0.005 across seeds AND the
step time keeps most of bf16's −7%.

Usage: python scripts/study_selective_precision.py
         [--seeds 0 1 2] [--epochs 12] [--iters 30]
         [--variants f32 bf16 bf16_att32 ...] [--skip-quality] [--skip-speed]
"""

import argparse
import dataclasses
import json
import tempfile
import time


def make_variant(base, name):
    """Apply a precision variant to any config. The base's own precision
    knobs are cleared first so variant names mean the same thing whatever
    the preset's default is (scannet_seg now DEFAULTS to bf16+bn32 — the
    winner of this very study; without the reset, 'f32' would silently
    measure that default instead of f32)."""
    m = dataclasses.replace(base.model, dtype="float32", att_dtype="",
                            interp_dtype="", bn_dtype="")
    if name == "f32":
        pass
    elif name == "bf16":
        m = dataclasses.replace(m, dtype="bfloat16")
    elif name == "bf16_att32":
        m = dataclasses.replace(m, dtype="bfloat16", att_dtype="float32")
    elif name == "bf16_interp32":
        m = dataclasses.replace(m, dtype="bfloat16", interp_dtype="float32")
    elif name == "bf16_att32_interp32":
        m = dataclasses.replace(m, dtype="bfloat16", att_dtype="float32",
                                interp_dtype="float32")
    elif name == "bf16_bn32":
        m = dataclasses.replace(m, dtype="bfloat16", bn_dtype="float32")
    elif name == "bf16_matmul_only":
        # only the Dense matmuls run bf16: BN/relu, attention path, and
        # the interpolation accumulation all stay f32
        m = dataclasses.replace(m, dtype="bfloat16", att_dtype="float32",
                                interp_dtype="float32",
                                bn_dtype="float32")
    else:
        raise ValueError(f"unknown variant {name}")
    return dataclasses.replace(
        base, name=f"{base.name}_{name}", model=m)


def quality_run(variant_name, seed, epochs):
    """One 12-epoch synthetic_scene_seg run; returns final held-out metrics."""
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.train.train import train

    cfg = make_variant(presets.get("synthetic_scene_seg"), variant_name)
    cfg = apply_overrides(cfg, {
        "train.seed": seed,
        "train.epochs": epochs,
        "train.eval_every": epochs,          # final eval only
        "train.ckpt_every": epochs,
        "train.ckpt_dir": tempfile.mkdtemp(
            prefix=f"selprec_{variant_name}_s{seed}_"),
    })
    log = tempfile.mktemp(suffix=".jsonl")
    train(cfg, log_path=log)
    final = None
    with open(log) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "eval":
                final = rec
    return {"variant": variant_name, "seed": seed,
            "miou": final["miou"], "overall_acc": final["overall_acc"]}


def speed_run(variant_name, iters):
    """Full jitted scannet_seg train step at crop shapes (train-leads
    protocol: augment + CAGQ + fwd + bwd + Adam, scalar-fetch sync)."""
    import jax
    import jax.numpy as jnp

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.data.pipeline import make_dataset
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.train.steps import build_train_step, create_train_state

    cfg = make_variant(presets.get("scannet_seg"), variant_name)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--iters", type=int, default=30)
    # the default list reproduces the decision table the scannet_seg
    # default rests on: both negatives (att32, att32+interp32), the
    # winning bf16_bn32 row, and the all-islands-f32 bound
    ap.add_argument("--variants", nargs="+",
                    default=["f32", "bf16", "bf16_att32",
                             "bf16_att32_interp32", "bf16_bn32",
                             "bf16_matmul_only"])
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--skip-speed", action="store_true")
    args = ap.parse_args()

    results = {"quality": [], "speed": {}}

    if not args.skip_speed:
        for v in args.variants:
            ms = speed_run(v, args.iters)
            results["speed"][v] = ms
            print(f"SPEED {v}: {ms:.2f} ms/step", flush=True)

    if not args.skip_quality:
        for seed in args.seeds:
            for v in args.variants:
                row = quality_run(v, seed, args.epochs)
                results["quality"].append(row)
                print("QUALITY " + json.dumps(row), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

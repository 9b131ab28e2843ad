"""Preset-scale convergence runs (VERDICT r2 #3).

Trains the real BASELINE configs — their actual (M, K, resolution,
channel) sizes, not the toy test models — on synthetic stand-ins to an
accuracy plateau on the real chip, and prints the held-out metrics that
get recorded into `train/accuracy_targets.json` as regression gates:

  * `modelnet40_full` on `synthetic_shapes40` (40 shape-family classes,
    1024 pts, batch 16 — the preset's exact model).
  * `scannet_seg` on `synthetic_scene` labeled surface scenes (8192-pt
    crops, batch 8, 4 part classes — the preset's exact encoder/decoder).

Usage:
  python scripts/convergence.py --run both [--epochs-cls 30 --epochs-seg 60]

The runs are minutes on a v5e chip. Held-out metrics are read back from
the JSONL the trainer writes; the final line is what gets recorded.
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridgcn_tpu.configs import presets
from gridgcn_tpu.configs.base import apply_overrides


def _train_and_read(cfg, log_path):
    from gridgcn_tpu.train.train import train

    train(cfg, log_path=log_path)
    evals = []
    with open(log_path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "eval":
                evals.append(rec)
    return evals


def run_cls(epochs: int):
    cfg = presets.get("modelnet40_full")
    cfg = apply_overrides(cfg, {
        "data.dataset": "synthetic_shapes40",
        "train.epochs": epochs,
        "train.eval_every": max(epochs // 10, 1),
        "train.ckpt_every": epochs,          # final only
        "train.ckpt_dir": tempfile.mkdtemp(prefix="conv_cls_"),
    })
    cfg = dataclasses.replace(cfg, name="modelnet40_full+shapes40")
    log = tempfile.mktemp(suffix=".jsonl")
    evals = _train_and_read(cfg, log)
    print("CLS eval trajectory (epoch, overall_acc):")
    for e in evals:
        print(f"  {e['epoch']:4d}  {e['overall_acc']:.4f}")
    best = max(e["overall_acc"] for e in evals)
    final = evals[-1]["overall_acc"]
    print(json.dumps({"run": "modelnet40_full+shapes40",
                      "final_overall_acc": final, "best": best}))
    return final


def run_seg(epochs: int, extra: dict | None = None):
    cfg = presets.get("scannet_seg")
    cfg = apply_overrides(cfg, {
        "data.dataset": "synthetic_scene",
        "data.synthetic_size": 96,
        "model.num_classes": 4,
        "train.epochs": epochs,
        "train.eval_every": max(epochs // 10, 1),
        "train.ckpt_every": epochs,
        "train.ckpt_dir": tempfile.mkdtemp(prefix="conv_seg_"),
        **(extra or {}),
    })
    # surface-scene labels have no "unannotated" class — drop the ScanNet
    # ignore-label protocol (every point scores)
    cfg = dataclasses.replace(
        cfg, name="scannet_seg+surface",
        model=dataclasses.replace(cfg.model, ignore_label=None))
    log = tempfile.mktemp(suffix=".jsonl")
    evals = _train_and_read(cfg, log)
    print("SEG eval trajectory (epoch, overall_acc, miou):")
    for e in evals:
        print(f"  {e['epoch']:4d}  {e['overall_acc']:.4f}  {e['miou']:.4f}")
    final = evals[-1]
    print(json.dumps({"run": "scannet_seg+surface",
                      "final_overall_acc": final["overall_acc"],
                      "final_miou": final["miou"]}))
    return final["miou"]


def run_spatial(epochs: int, extra: dict | None = None):
    """`scannet_seg` trained SPATIALLY (tier 3, mesh=1, each example one
    whole scene through `train_spatial`) on the SAME labeled surface
    scenes as `run_seg`, then evaluated with the identical held-out
    protocol — preset-scale QUALITY evidence for the spatially-sharded
    training path (its latency was measured in §13; its convergence had
    only tiny-scale tests). Comparable numbers (60 epochs, this exact
    held-out protocol): crop-DP 0.847 mIoU augmented (the
    `scannet_seg_surface` gate) / 0.9264 unaugmented — whole-scene
    spatial training scores 0.9498, beating crops like-for-like."""
    import jax
    import jax.numpy as jnp

    from gridgcn_tpu.data.pipeline import make_dataset
    from gridgcn_tpu.train.metrics import summarize_confusion
    from gridgcn_tpu.train.steps import make_eval_step
    from gridgcn_tpu.train.train import train_spatial

    cfg = presets.get("scannet_seg")
    cfg = apply_overrides(cfg, {
        "data.dataset": "synthetic_scene",
        "data.synthetic_size": 96,
        "model.num_classes": 4,
        "train.epochs": epochs,
        "train.ckpt_every": epochs,
        "train.ckpt_dir": tempfile.mkdtemp(prefix="conv_sp_"),
        # protocol pins augment OFF — the measured 2x2 on this task
        # (60 epochs, held-out mIoU): crop-DP 0.847 aug / 0.9264 no-aug;
        # spatial 0.3256 aug / 0.9498 no-aug. Augmentation hurts BOTH
        # regimes here (the synthetic surface labels are not fully
        # rotation-invariant — a rotation-ONLY 12-epoch arm scores 0.19,
        # below full augment), and the B=1 whole-scene regime amplifies
        # the damage. Recorded in accuracy_targets.json; reproduce with
        # --override data.augment=true.
        "data.augment": False,
        **(extra or {}),
    })
    cfg = dataclasses.replace(
        cfg, name="scannet_seg+surface_spatial",
        model=dataclasses.replace(cfg.model, ignore_label=None))
    log = tempfile.mktemp(suffix=".jsonl")
    state = train_spatial(cfg, mesh_devices=1, tier="resident_ml",
                          log_path=log)

    # held-out eval: run_seg's exact protocol (monolithic eval step over
    # the test split's crops) so the two numbers are directly comparable
    from gridgcn_tpu.models.build import init_model
    model, _ = init_model(cfg)
    eval_step = make_eval_step(cfg, model)
    val_ds = make_dataset(cfg.data, "test", cfg.model.num_classes, "seg")
    cm = jnp.zeros((cfg.model.num_classes, cfg.model.num_classes),
                   jnp.int32)
    ek = jax.random.PRNGKey(10_000)
    for batch in val_ds.batches(cfg.data.eval_batch_size, seed=0,
                                shuffle=False, drop_last=False):
        cm = cm + eval_step(state, {k: jnp.asarray(v)
                                    for k, v in batch.items()}, ek)
    s = summarize_confusion(cm)
    with open(log) as f:
        last_ep = [json.loads(l) for l in f
                   if json.loads(l).get("kind") == "epoch"][-1]
    print(f"SPATIAL-TRAIN held-out: overall_acc {float(s['overall_acc']):.4f}"
          f"  miou {float(s['miou']):.4f}  (final train acc "
          f"{last_ep['acc']:.4f}, ghost_overflow "
          f"{last_ep.get('ghost_overflow', 0)})")
    print(json.dumps({"run": "scannet_seg+surface_spatial_tier3",
                      "final_overall_acc": float(s["overall_acc"]),
                      "final_miou": float(s["miou"]),
                      "ghost_overflow": int(last_ep.get("ghost_overflow",
                                                        0))}))
    return float(s["miou"])


def run_s3dis(epochs: int):
    """`s3dis_seg` preset (4096-pt blocks, in_channels=6) on labeled
    surface scenes with synthesized rgb-like + normalized-xyz features
    (VERDICT r3 #7) — the featured input path at preset scale."""
    cfg = presets.get("s3dis_seg")
    cfg = apply_overrides(cfg, {
        "data.dataset": "synthetic_scene",
        "data.num_points": 4096,
        "data.synthetic_size": 96,
        "model.num_classes": 4,
        "train.epochs": epochs,
        "train.eval_every": max(epochs // 10, 1),
        "train.ckpt_every": epochs,
        "train.ckpt_dir": tempfile.mkdtemp(prefix="conv_s3dis_"),
    })
    cfg = dataclasses.replace(cfg, name="s3dis_seg+surface")
    log = tempfile.mktemp(suffix=".jsonl")
    evals = _train_and_read(cfg, log)
    print("S3DIS eval trajectory (epoch, overall_acc, miou):")
    for e in evals:
        print(f"  {e['epoch']:4d}  {e['overall_acc']:.4f}  {e['miou']:.4f}")
    final = evals[-1]
    print(json.dumps({"run": "s3dis_seg+surface",
                      "final_overall_acc": final["overall_acc"],
                      "final_miou": final["miou"]}))
    return final["miou"]


def run_field(epochs: int, seed: int = 0, extra: dict | None = None):
    """`s3dis_seg` preset on the feature-FIELD task (VERDICT r4 #4): labels
    are thresholded smooth hidden fields observed only through noisy
    per-point features, so (a) the gate requires NEIGHBORHOOD aggregation
    of features (per-point evidence ≈ chance, 32-NN oracle ≈ 0.9) and
    (b) the plateau sits MID-BAND, where a bf16-sized quality regression
    is visible — unlike the two saturated gates (1.0 / 0.999). Run with
    --seed 0 and 1 to measure the paired-seed spread the target's
    detectable-delta note is based on."""
    cfg = presets.get("s3dis_seg")
    cfg = apply_overrides(cfg, {
        "data.dataset": "synthetic_field",
        "data.num_points": 4096,
        "data.synthetic_size": 96,
        "model.num_classes": 4,
        "train.seed": seed,
        "train.epochs": epochs,
        "train.eval_every": max(epochs // 10, 1),
        "train.ckpt_every": epochs,
        "train.ckpt_dir": tempfile.mkdtemp(prefix="conv_field_"),
        **(extra or {}),
    })
    cfg = dataclasses.replace(cfg, name="s3dis_seg+field")
    log = tempfile.mktemp(suffix=".jsonl")
    evals = _train_and_read(cfg, log)
    print("FIELD eval trajectory (epoch, overall_acc, miou):")
    for e in evals:
        print(f"  {e['epoch']:4d}  {e['overall_acc']:.4f}  {e['miou']:.4f}")
    final = evals[-1]
    best = max(e["overall_acc"] for e in evals)
    print(json.dumps({"run": "s3dis_seg+field", "seed": seed,
                      "final_overall_acc": final["overall_acc"],
                      "final_miou": final["miou"],
                      "best_overall_acc": best}))
    return final["overall_acc"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run",
                    choices=["cls", "seg", "s3dis", "field", "spatial",
                             "both", "all"],
                    default="both")
    ap.add_argument("--epochs-cls", type=int, default=30)
    ap.add_argument("--epochs-seg", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0,
                    help="train seed (field arm: paired-seed spread)")
    ap.add_argument("--override", action="append", default=[],
                    help="dotted config override k=v, applied to the seg, "
                         "spatial, and field arms (cls/s3dis ignore it); "
                         "e.g. model.dtype=bfloat16 to measure a known "
                         "regression against the gate, or data.augment=true "
                         "to reproduce the augmented arms of the 2x2")
    args = ap.parse_args()
    if args.run in ("cls", "both", "all"):
        run_cls(args.epochs_cls)
    if args.run in ("seg", "both", "all"):
        from gridgcn_tpu.configs.base import parse_cli_overrides
        run_seg(args.epochs_seg, extra=parse_cli_overrides(args.override))
    if args.run in ("s3dis", "all"):
        run_s3dis(args.epochs_seg)
    if args.run in ("spatial", "all"):
        from gridgcn_tpu.configs.base import parse_cli_overrides
        run_spatial(args.epochs_seg,
                    extra=parse_cli_overrides(args.override))
    if args.run in ("field", "all"):
        from gridgcn_tpu.configs.base import parse_cli_overrides
        run_field(args.epochs_seg, seed=args.seed,
                  extra=parse_cli_overrides(args.override))


if __name__ == "__main__":
    main()

"""F-15/F-16 integration: overfit gate + checkpoint roundtrip (SURVEY §4.2 #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridgcn_tpu.configs import presets
from gridgcn_tpu.configs.base import apply_overrides
from gridgcn_tpu.data.pipeline import make_dataset
from gridgcn_tpu.models.build import init_model
from gridgcn_tpu.train.steps import (
    create_train_state, make_eval_step, make_train_step)
from gridgcn_tpu.utils.checkpoint import CheckpointManager


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = presets.get("synthetic_tiny")
    model, variables = init_model(cfg)
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "cls")
    state = create_train_state(cfg, model, variables,
                               ds.steps_per_epoch(cfg.data.batch_size))
    return cfg, model, ds, state


def test_overfit_synthetic(tiny_setup):
    """The integration gate: tiny model overfits the synthetic set."""
    cfg, model, ds, state = tiny_setup
    step = make_train_step(cfg, model, donate=False)
    rng = jax.random.PRNGKey(0)
    last_acc = 0.0
    for epoch in range(12):
        accs = []
        for batch in ds.batches(cfg.data.batch_size, seed=epoch):
            state, m = step(state, {k: jnp.asarray(v)
                                    for k, v in batch.items()}, rng)
            accs.append(float(m["acc"]))
        last_acc = float(np.mean(accs))
    assert last_acc >= 0.9, f"failed to overfit: train acc {last_acc}"
    assert bool(jnp.isfinite(m["loss"]))


def test_mesh_dp_training_end_to_end(tmp_path):
    """Full train() loop on the 8-fake-device mesh (F-19 end to end)."""
    import jax as _jax
    from gridgcn_tpu.train.train import train

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    cfg = presets.get("synthetic_tiny")
    cfg = apply_overrides(cfg, {
        "train.epochs": 1, "train.ckpt_dir": str(tmp_path / "ck"),
        "train.eval_every": 1, "data.batch_size": 8})
    state = train(cfg, mesh_devices=8, log_path=str(tmp_path / "m.jsonl"))
    assert int(state.step) == 8   # 64 clouds / batch 8
    # step-0 capacity audit landed in the metrics log (VERDICT r2 #9)
    import json
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    cap = [l for l in lines if l.get("kind") == "capacity"]
    assert len(cap) == 1 and 0.0 <= cap[0]["dropped_frac"] <= 1.0
    assert cap[0]["nv"] == cfg.model.layers[0].nv
    assert not cap[0]["over_budget"]


def test_capacity_audit_flags_undersized_nv():
    """audit_layer0_capacity catches a mis-sized (resolution, nv) pairing
    on a skewed dataset — the step-0 guard real data relies on."""
    from gridgcn_tpu.configs.base import apply_overrides as _ov
    from gridgcn_tpu.utils.debug import audit_layer0_capacity

    cfg = presets.get("synthetic_tiny")
    # all points in one voxel corner: resolution 8 with nv=8 must drop most
    rng = np.random.default_rng(0)
    pts = (rng.uniform(0, 0.05, (2, 256, 3)).astype(np.float32))
    pts[:, 0] = [1.0, 1.0, 1.0]   # pin the extent so the grid spans [0, 1]
    report = audit_layer0_capacity(cfg, pts)
    assert report["over_budget"] and report["dropped_frac"] > 0.5
    # and a healthy uniform cloud passes
    ok = audit_layer0_capacity(
        cfg, rng.uniform(0, 1, (2, 256, 3)).astype(np.float32))
    assert not ok["over_budget"]


def test_auto_capacity_proposes_and_applies(tmp_path):
    """--auto-capacity (VERDICT r3 #8): on an over-dropping config the
    trainer logs the smallest §12-justified (nv, resolution) bump and,
    in 'apply' mode, trains with it — one-command real-data onboarding."""
    import dataclasses
    import json

    from gridgcn_tpu.configs.base import apply_overrides
    from gridgcn_tpu.train.train import train
    from gridgcn_tpu.utils.debug import propose_layer0_capacity

    # synthetic surface scenes have skewed occupancy; nv=1 over-drops
    base = presets.get("synthetic_scene_seg")
    l0 = dataclasses.replace(base.model.layers[0], nv=1)
    cfg = dataclasses.replace(base, model=dataclasses.replace(
        base.model, layers=(l0,) + base.model.layers[1:]))
    cfg = apply_overrides(cfg, {
        "train.epochs": 1, "train.eval_every": 0,
        "train.ckpt_every": 0, "data.synthetic_size": 8,
        "train.ckpt_dir": str(tmp_path / "ck"),
    })

    # the proposal alone: monotone search lands within budget, nv > 1
    from gridgcn_tpu.data.pipeline import make_dataset
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "seg")
    prop = propose_layer0_capacity(cfg, ds.points)
    assert prop["within_budget"] and prop["nv"] > 1
    assert prop["tried"][0]["dropped_frac"] > prop["budget"]

    log = tmp_path / "auto.jsonl"
    train(cfg, log_path=str(log), auto_capacity="apply")
    recs = [json.loads(l) for l in open(log)]
    audit = [r for r in recs if r.get("kind") == "capacity"]
    proposal = [r for r in recs if r.get("kind") == "capacity_proposal"]
    assert audit and audit[0]["over_budget"]
    assert proposal and proposal[0]["applied"]
    assert proposal[0]["nv"] == prop["nv"]
    assert any(r.get("kind") == "epoch" for r in recs)


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    cfg, model, ds, state = tiny_setup
    cfg = apply_overrides(cfg, {"train.ckpt_dir": str(tmp_path / "ck")})
    step = make_train_step(cfg, model, donate=False)
    rng = jax.random.PRNGKey(0)
    batch = next(ds.batches(cfg.data.batch_size, seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = step(state, batch, rng)

    mgr = CheckpointManager(cfg.train.ckpt_dir, cfg, keep=2)
    mgr.save(int(state.step), jax.device_get(state), jax.device_get(rng))
    mgr.wait()

    _, variables = init_model(cfg, seed=123)   # different init
    fresh = create_train_state(cfg, model, variables, 1)
    restored = mgr.restore(fresh, rng)
    assert restored is not None
    r_state = restored["state"]
    assert int(r_state.step) == int(state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        jax.device_get(state.params), r_state.params)

    # restored state produces identical eval outputs
    ev = make_eval_step(cfg, model)
    cm1 = ev(state, batch, rng)
    cm2 = ev(r_state, batch, rng)
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm2))

    # config roundtrips through the checkpoint dir
    cfg2 = CheckpointManager.load_config(cfg.train.ckpt_dir)
    assert cfg2 == cfg


def test_rotation_voting_eval(tiny_setup):
    """F-16: rotation-voting eval — a full-circle vote set on a rotation-
    augmented classifier produces a valid confusion matrix, and voting on
    clouds rotated by one vote angle gives the SAME averaged-logit matrix
    (the vote set is closed under its own rotation up to CAGQ randomness)."""
    from gridgcn_tpu.train.steps import make_voting_eval_step

    cfg, model, ds, state = tiny_setup
    batch = {k: jnp.asarray(v) for k, v in
             next(ds.batches(cfg.data.batch_size, seed=0)).items()}
    rng = jax.random.PRNGKey(0)

    step = make_voting_eval_step(cfg, model, votes=4)
    cm = np.asarray(step(state, batch, rng))
    C = cfg.model.num_classes
    assert cm.shape == (C, C)
    assert cm.sum() == cfg.data.batch_size        # one vote-averaged row/cloud
    # votes=1 reduces to the plain eval step (same rng stream modulo fold_in)
    cm1 = np.asarray(make_voting_eval_step(cfg, model, votes=1)(
        state, batch, rng))
    assert cm1.sum() == cfg.data.batch_size

    # voting must actually HELP on mis-oriented inputs (VERDICT r1 weak #6):
    # rotate the eval batch by pi/4 — votes=8 includes the inverse rotation
    # (pi/4 + 7*2pi/8 = 2pi), votes=1 sees only the rotated cloud, so the
    # vote-averaged accuracy must be at least as good
    theta = np.pi / 4
    rot = jnp.asarray([[np.cos(theta), 0, np.sin(theta)], [0, 1, 0],
                       [-np.sin(theta), 0, np.cos(theta)]],
                      batch["xyz"].dtype)
    rbatch = dict(batch, xyz=batch["xyz"] @ rot)
    acc = lambda cm: np.trace(cm) / cm.sum()
    cm8 = np.asarray(make_voting_eval_step(cfg, model, votes=8)(
        state, rbatch, rng))
    cm1r = np.asarray(make_voting_eval_step(cfg, model, votes=1)(
        state, rbatch, rng))
    assert acc(cm8) >= acc(cm1r), (acc(cm8), acc(cm1r))


def test_generalization_synthetic():
    """Accuracy gate beyond overfit (SURVEY §4.2 #4): train on the
    synthetic shape-class TRAIN split (seed 0), evaluate on the held-out
    TEST split (seed 1) — the learned features must transfer to clouds the
    model never saw, well above the 4-class chance rate."""
    from gridgcn_tpu.train.metrics import summarize_confusion

    cfg = presets.get("synthetic_tiny")
    model, variables = init_model(cfg)
    train_ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "cls")
    test_ds = make_dataset(cfg.data, "test", cfg.model.num_classes, "cls")
    assert not np.array_equal(train_ds.points[0], test_ds.points[0])

    state = create_train_state(cfg, model, variables,
                               train_ds.steps_per_epoch(cfg.data.batch_size))
    step = make_train_step(cfg, model, donate=False)
    rng = jax.random.PRNGKey(0)
    i = 0
    for epoch in range(6):
        for batch in train_ds.batches(cfg.data.batch_size, seed=epoch):
            state, _ = step(state, {k: jnp.asarray(v)
                                    for k, v in batch.items()},
                            jax.random.fold_in(rng, i))
            i += 1

    eval_step = make_eval_step(cfg, model)
    cm = jnp.zeros((cfg.model.num_classes,) * 2, jnp.int32)
    for batch in test_ds.batches(cfg.data.batch_size, seed=0,
                                 shuffle=False, drop_last=False):
        cm = cm + eval_step(state, {k: jnp.asarray(v)
                                    for k, v in batch.items()}, rng)
    oa = float(summarize_confusion(cm)["overall_acc"])
    # regression gate against the RECORDED round-over-round target
    # (gridgcn_tpu/train/accuracy_targets.json; measured 1.0 in round 2) —
    # a drop below it means an accuracy regression, not noise
    import json, os
    import gridgcn_tpu.train as _tr
    targets = json.load(open(os.path.join(
        os.path.dirname(_tr.__file__), "accuracy_targets.json")))
    t = targets["synthetic_tiny_heldout"]["target"]
    assert oa >= t, f"held-out overall accuracy {oa:.3f} < recorded {t}"


def test_surface_scene_segmentation_learns():
    """The surface-scene stand-in (synthetic_scene_seg preset: realistic
    density skew, part labels) is learnable end to end, gated against the
    RECORDED segmentation targets (accuracy_targets.json
    `synthetic_scene_heldout`: measured r3 OA 0.607 / mIoU 0.290 on this
    deterministic CPU run — targets sit just under so a real regression
    fails, not noise). Replaces the round-2 'beats majority class' check
    (VERDICT r2 weak #5: no pinned segmentation target existed)."""
    from gridgcn_tpu.train.metrics import summarize_confusion

    cfg = presets.get("synthetic_scene_seg")
    cfg = apply_overrides(cfg, {"data.num_points": 1024, "train.epochs": 4})
    model, variables = init_model(cfg)
    tr = make_dataset(cfg.data, "train", 4, "seg")
    te = make_dataset(cfg.data, "test", 4, "seg")
    state = create_train_state(cfg, model, variables,
                               tr.steps_per_epoch(cfg.data.batch_size))
    step = make_train_step(cfg, model, donate=False)
    rng = jax.random.PRNGKey(0)
    i = 0
    for ep in range(cfg.train.epochs):
        for b in tr.batches(cfg.data.batch_size, seed=ep):
            state, m = step(state, {k: jnp.asarray(v) for k, v in b.items()},
                            jax.random.fold_in(rng, i))
            i += 1
    ev = make_eval_step(cfg, model)
    cm = jnp.zeros((4, 4), jnp.int32)
    for b in te.batches(4, seed=0, shuffle=False, drop_last=False):
        cm = cm + ev(state, {k: jnp.asarray(v) for k, v in b.items()}, rng)
    s = summarize_confusion(cm)
    oa, miou = float(s["overall_acc"]), float(s["miou"])
    import json, os
    import gridgcn_tpu.train as _tr
    t = json.load(open(os.path.join(
        os.path.dirname(_tr.__file__), "accuracy_targets.json")))[
        "synthetic_scene_heldout"]
    assert miou >= t["target"], (
        f"surface-scene held-out mIoU {miou:.4f} < recorded {t['target']}")
    assert oa >= t["target_overall_acc"], (
        f"surface-scene held-out OA {oa:.4f} < recorded "
        f"{t['target_overall_acc']}")


def test_eval_confusion_excludes_padded_examples(tiny_setup):
    """A final partial batch is padded with duplicate clouds; the eval
    step's confusion matrix must count each real cloud exactly once
    (cls: example_mask weights; seg: example_mask ANDed into the point
    mask — _confusion_mask)."""
    from gridgcn_tpu.train.steps import _confusion_mask

    cfg, model, ds, state = tiny_setup
    step = make_eval_step(cfg, model)
    rng = jax.random.PRNGKey(0)
    B = 7   # does not divide ds.size → padded final batch
    assert ds.size % B != 0
    cm = jnp.zeros((cfg.model.num_classes,) * 2, jnp.int32)
    for batch in ds.batches(B, seed=0, shuffle=False, drop_last=False):
        cm = cm + step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                       rng)
    assert int(cm.sum()) == ds.size

    # seg shape of the same rule: padded example's POINTS drop out
    seg_cfg = presets.get("synthetic_tiny_seg")
    batch = {"mask": np.ones((4, 8), bool),
             "example_mask": np.array([True, True, True, False])}
    m = _confusion_mask(seg_cfg, batch)
    assert m.shape == (4, 8) and m[:3].all() and not m[3].any()


def test_checkpoint_dir_rejects_config_change(tmp_path):
    """A checkpoint dir is bound to one config: reusing it with different
    hyperparameters must fail fast, not resume old weights under a new
    config (or die later in from_state_dict)."""
    cfg = presets.get("synthetic_tiny")
    CheckpointManager(str(tmp_path), cfg, keep=1)
    # same config again: fine (restore/evaluate flows)
    CheckpointManager(str(tmp_path), cfg, keep=1)
    changed = apply_overrides(cfg, {"train.lr": cfg.train.lr * 2})
    with pytest.raises(ValueError, match="different config"):
        CheckpointManager(str(tmp_path), changed, keep=1)


def test_checkpoint_dir_survives_additive_schema_change(tmp_path):
    """A checkpoint written BEFORE a config field existed must keep
    loading after the field is added (new fields always carry defaults).
    The binding check compares configs through the current schema, not
    raw JSON strings — string equality bricked every existing checkpoint
    on any additive schema change (found by round-3's eval_dtype field)."""
    import json as _json
    import os as _os

    cfg = presets.get("synthetic_tiny")
    CheckpointManager(str(tmp_path), cfg, keep=1)
    cfg_path = _os.path.join(str(tmp_path), "config.json")
    d = _json.load(open(cfg_path))
    # simulate an old-schema file: drop a default-valued leaf field
    assert d["model"].pop("eval_dtype") == ""
    _json.dump(d, open(cfg_path, "w"))
    CheckpointManager(str(tmp_path), cfg, keep=1)   # must not raise
    # but a REAL semantic difference hidden in an old file still refuses
    d["train"]["lr"] = cfg.train.lr * 2
    _json.dump(d, open(cfg_path, "w"))
    with pytest.raises(ValueError, match="different config"):
        CheckpointManager(str(tmp_path), cfg, keep=1)


def test_ignore_label_excluded_from_loss_and_metrics():
    """Reference ScanNet protocol: ignore-labeled (unannotated) points carry
    no loss, no accuracy weight, no confusion-matrix weight, and weight-0 in
    the inverse-frequency class weights."""
    import dataclasses

    from gridgcn_tpu.train.steps import (
        _confusion_mask, _loss_and_logits, class_weights_from_dataset)

    cfg = presets.get("synthetic_scene_seg")
    cfg_ig = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, ignore_label=0))
    C = cfg.model.num_classes
    rng = np.random.default_rng(0)
    B, N = 2, 64
    logits = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, size=(B, N)), jnp.int32)
    mask = jnp.ones((B, N), bool)
    batch = {"label": labels, "mask": mask}

    loss_ig, acc_ig = _loss_and_logits(cfg_ig, logits, batch)
    # oracle: loss/acc computed over the non-ignored points only
    keep = mask & (labels != 0)
    batch_keep = {"label": labels, "mask": keep}
    loss_ref, acc_ref = _loss_and_logits(cfg, logits, batch_keep)
    np.testing.assert_allclose(float(loss_ig), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(float(acc_ig), float(acc_ref), rtol=1e-6)

    cmask = _confusion_mask(cfg_ig, batch)
    np.testing.assert_array_equal(np.asarray(cmask), np.asarray(keep))

    w = np.asarray(class_weights_from_dataset(
        np.asarray(labels), C, ignore_label=0))
    assert w[0] == 0.0 and (w[1:] > 0).all()


def test_accuracy_targets_file_consistent():
    """The recorded targets file (gridgcn_tpu/train/accuracy_targets.json)
    is a contract: every repo-measured entry must carry a measured value
    that SATISFIES its own target (else the gate was recorded broken), and
    the preset-scale convergence entries (VERDICT r2 #3) must exist with
    their r3 measurements."""
    import json, os
    import gridgcn_tpu.train as _tr

    t = json.load(open(os.path.join(
        os.path.dirname(_tr.__file__), "accuracy_targets.json")))

    assert t["synthetic_tiny_heldout"]["measured_r3"] >= \
        t["synthetic_tiny_heldout"]["target"] == 0.99
    s = t["synthetic_scene_heldout"]
    assert s["measured_r3_miou"] >= s["target"]
    assert s["measured_r3_overall_acc"] >= s["target_overall_acc"]

    # preset-scale convergence gates: the actual BASELINE configs trained
    # to plateau on the real chip (scripts/convergence.py)
    cls = t["modelnet40_full_shapes40"]
    assert cls["measured_r3"] >= cls["target"] >= 0.95
    assert 0 < cls["short_run_allowance"] <= 0.05
    seg = t["scannet_seg_surface"]
    assert seg["measured_r3_miou"] >= seg["target"] >= 0.8
    assert seg["measured_r3_overall_acc"] >= seg["target_overall_acc"]

    # reference-published targets stay pinned (BASELINE.json north star)
    assert t["modelnet40"]["target"] == 0.931
    assert t["s3dis"]["target"] == 0.5775
    assert t["scannet"]["target"] == 0.851

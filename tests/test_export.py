"""AOT export (jax.export): the frozen artifact reproduces the live
predictor, pads smaller batches, and survives a fresh deserialize."""

import json
import os

import numpy as np
import pytest

from gridgcn_tpu.api import load_predictor
from gridgcn_tpu.configs import presets
from gridgcn_tpu.configs.base import apply_overrides
from gridgcn_tpu.export import export_predictor, load_exported
from gridgcn_tpu.train.train import train


@pytest.fixture(scope="module")
def cls_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ck_exp"))
    cfg = presets.get("synthetic_tiny")
    cfg = apply_overrides(cfg, {"train.epochs": 1, "train.ckpt_dir": d,
                                "train.eval_every": 5})
    train(cfg)
    return d


def test_export_roundtrip_matches_live(cls_dir, tmp_path):
    import jax

    out = str(tmp_path / "model.shlo")
    meta = export_predictor(cls_dir, out, batch_size=4, num_points=256)
    assert os.path.exists(out) and os.path.exists(out + ".json")
    assert meta["bytes"] > 0 and meta["task"] == "cls"
    with open(out + ".json") as f:
        assert json.load(f)["format"] == "gridgcn-tpu-export-v1"

    predict = load_predictor(cls_dir)
    frozen = load_exported(out)
    rng = np.random.default_rng(0)
    batch = rng.uniform(-1, 1, size=(4, 256, 3)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    live_out = predict(batch, rng=key)
    froz_out = frozen(batch, rng=key)
    assert froz_out.shape == live_out.shape
    np.testing.assert_allclose(live_out, froz_out, rtol=1e-5, atol=1e-5)

    # smaller batch rides the padded signature; each cloud's CAGQ stream is
    # independent of the padding rows, so row 0 must agree bit-for-tolerance
    small = frozen(batch[:2], rng=key)
    assert small.shape == (2, froz_out.shape[-1])
    np.testing.assert_allclose(small[0], froz_out[0], rtol=1e-5, atol=1e-5)
    one = frozen(batch[0], rng=key)       # [N,3] squeeze form
    np.testing.assert_allclose(one, froz_out[0], rtol=1e-5, atol=1e-5)


def test_export_signature_guards(cls_dir, tmp_path):
    out = str(tmp_path / "model.shlo")
    export_predictor(cls_dir, out, batch_size=2, num_points=256)
    frozen = load_exported(out)
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="exceeds the exported"):
        frozen(rng.uniform(-1, 1, (3, 256, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="in_channels"):
        frozen(rng.uniform(-1, 1, (2, 256, 3)).astype(np.float32),
               feat=rng.uniform(-1, 1, (2, 256, 3)).astype(np.float32))


def test_export_seg_and_cli(tmp_path):
    """Seg model: per-point logits trim back to the query batch/points, and
    the CLI entry emits its summary line."""
    d = str(tmp_path / "ck_seg")
    cfg = presets.get("synthetic_tiny_seg")
    cfg = apply_overrides(cfg, {"train.epochs": 1, "train.ckpt_dir": d,
                                "train.eval_every": 5})
    train(cfg)

    from gridgcn_tpu.export import main
    out = str(tmp_path / "seg.shlo")
    rc = main(["--ckpt-dir", d, "--out", out,
               "--batch-size", "2", "--num-points", "256"])
    assert rc == 0

    frozen = load_exported(out)
    rng = np.random.default_rng(2)
    scene = rng.uniform(0, 2, size=(2, 256, 3)).astype(np.float32)
    out_full = frozen(scene)
    assert out_full.shape == (2, 256, cfg.model.num_classes)
    assert np.isfinite(out_full).all()
    # under-length cloud pads (masked) and trims back
    out_trim = frozen(scene[:1, :200])
    assert out_trim.shape == (1, 200, cfg.model.num_classes)
    assert np.isfinite(out_trim).all()
    # voting protocol on the frozen artifact: averages distinct CAGQ seeds
    out_v = frozen(scene, votes=3)
    assert out_v.shape == out_full.shape and np.isfinite(out_v).all()
    assert not np.allclose(out_v, out_full)
    with pytest.raises(ValueError, match="votes"):
        frozen(scene, votes=0)

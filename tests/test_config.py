"""F-17 config system: serialization roundtrip + overrides."""

import pytest

from gridgcn_tpu.configs import presets
from gridgcn_tpu.configs.base import (
    apply_overrides, from_json, parse_cli_overrides, to_json)


@pytest.mark.parametrize("name", sorted(presets.PRESETS))
def test_json_roundtrip(name):
    cfg = presets.get(name)
    assert from_json(to_json(cfg)) == cfg


def test_overrides():
    cfg = presets.get("modelnet40_full")
    out = apply_overrides(cfg, parse_cli_overrides(
        ["train.lr=0.01", "data.batch_size=32", "model.dropout=0.3",
         "data.augment=false"]))
    assert out.train.lr == 0.01
    assert out.data.batch_size == 32
    assert out.model.dropout == 0.3
    assert out.data.augment is False
    # untouched fields preserved
    assert out.model.layers == cfg.model.layers


def test_unknown_key_rejected():
    cfg = presets.get("modelnet40_full")
    with pytest.raises(KeyError):
        apply_overrides(cfg, {"train.nonexistent": 1})


def test_configs_hashable_static():
    cfg = presets.get("modelnet40_full")
    hash(cfg)          # frozen dataclasses must be hashable for jit statics
    hash(cfg.model.layers[0])


def test_up_layer_method_validated():
    import pytest

    from gridgcn_tpu.configs.base import UpLayerSpec

    UpLayerSpec(method="pallas")   # valid
    with pytest.raises(ValueError, match="bogus"):
        UpLayerSpec(method="bogus")

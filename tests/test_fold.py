"""Inference BatchNorm folding (models/fold.py, VERDICT r2 item 1c).

The fold must be output-equivalent to running the BNs: randomized running
stats + scale/bias (fresh-init stats are identity, which would vacuously
pass), then folded-model logits vs unfolded within f32 tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.configs import presets
from gridgcn_tpu.models.build import build_model, example_inputs, init_model
from gridgcn_tpu.models.fold import fold_batchnorm, fold_inference


def _rngs():
    return {"cagq": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}


def _randomize_bn(variables, seed=0):
    """Give every BN non-trivial stats/affine so the fold math is exercised."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)

    def walk(tree, which):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "_bn" in k:
                    out[k] = dict(v)
                    if which == "params":
                        out[k]["scale"] = 0.5 + jax.random.uniform(
                            keys[0], v["scale"].shape)
                        out[k]["bias"] = jax.random.normal(
                            keys[1], v["bias"].shape) * 0.3
                    else:
                        out[k]["mean"] = jax.random.normal(
                            keys[2], v["mean"].shape) * 0.2
                        out[k]["var"] = 0.25 + jax.random.uniform(
                            keys[3], v["var"].shape)
                else:
                    out[k] = walk(v, which)
            else:
                out[k] = v
        return out

    return {"params": walk(variables["params"], "params"),
            "batch_stats": walk(variables["batch_stats"], "stats")}


def _check_equivalence(preset_name):
    cfg = presets.get(preset_name)
    model, variables = init_model(cfg)
    variables = _randomize_bn(variables)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    ref = model.apply(variables, xyz, feat, mask, train=False, rngs=_rngs())

    fcfg, fvars = fold_inference(cfg, variables)
    assert fcfg.model.fold_bn
    assert "batch_stats" not in fvars
    flat = jax.tree_util.tree_leaves_with_path(fvars["params"])
    assert not any("_bn" in jax.tree_util.keystr(p) for p, _ in flat)

    fmodel = build_model(fcfg.model)
    out = fmodel.apply(fvars, xyz, feat, mask, train=False, rngs=_rngs())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fold_classifier_equivalent(rng_key):
    _check_equivalence("synthetic_tiny")


def test_fold_segmentation_equivalent(rng_key):
    _check_equivalence("synthetic_tiny_seg")


def test_fold_bf16_close_and_casts_params(rng_key):
    cfg = presets.get("synthetic_tiny_seg")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    model, variables = init_model(cfg)
    variables = _randomize_bn(variables)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    ref = model.apply(variables, xyz, feat, mask, train=False, rngs=_rngs())

    fcfg, fvars = fold_inference(cfg, variables)
    # bf16 presets get pre-cast Dense weights (kills per-forward cast ops)
    k0 = fvars["params"]["gridconv0"]["gca"]["edge_dense0"]["kernel"]
    assert k0.dtype == jnp.bfloat16
    assert fvars["params"]["logits"]["kernel"].dtype == jnp.float32

    fmodel = build_model(fcfg.model)
    out = fmodel.apply(fvars, xyz, feat, mask, train=False, rngs=_rngs())
    assert out.dtype == ref.dtype == jnp.float32
    agree = float((jnp.argmax(out, -1) == jnp.argmax(ref, -1)).mean())
    assert agree >= 0.98, f"folded-bf16 argmax agreement {agree:.4f}"
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.1 * scale)


def test_fold_eval_dtype_serves_f32_train_in_bf16(rng_key):
    """VERDICT r2 #8: a preset that TRAINS in f32 but sets
    eval_dtype='bfloat16' (the modelnet40_* presets) must fold into a
    bf16-serving model with the classification fidelity bound, while the
    training config is untouched f32."""
    cfg = presets.get("synthetic_tiny")   # f32-trained cls config
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, eval_dtype="bfloat16"))
    assert cfg.model.dtype == "float32"
    model, variables = init_model(cfg)
    variables = _randomize_bn(variables)
    xyz, feat, mask = example_inputs(cfg, batch_size=4)
    ref = model.apply(variables, xyz, feat, mask, train=False, rngs=_rngs())

    fcfg, fvars = fold_inference(cfg, variables)
    assert fcfg.model.dtype == "bfloat16"     # serving compute dtype
    k0 = fvars["params"]["gridconv0"]["gca"]["edge_dense0"]["kernel"]
    assert k0.dtype == jnp.bfloat16
    assert fvars["params"]["logits"]["kernel"].dtype == jnp.float32

    out = build_model(fcfg.model).apply(fvars, xyz, feat, mask,
                                        train=False, rngs=_rngs())
    assert out.dtype == jnp.float32
    agree = float((jnp.argmax(out, -1) == jnp.argmax(ref, -1)).mean())
    assert agree >= 0.98, f"bf16-served argmax agreement {agree:.4f}"
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.1 * scale)

    # the modelnet40 presets carry the flag (keeps the preset honest)
    for name in ("modelnet40_full", "modelnet40_cas", "modelnet40_compact"):
        assert presets.get(name).model.eval_dtype == "bfloat16", name


def test_fold_counts_every_bn(rng_key):
    cfg = presets.get("synthetic_tiny_seg")
    _, variables = init_model(cfg)
    _, n = fold_batchnorm(variables)
    # encoder GCA mlps + up mlps + head: every BN in the net must be found
    n_bn = sum(1 for p, _ in jax.tree_util.tree_leaves_with_path(
        variables["batch_stats"]) if "mean" in jax.tree_util.keystr(p))
    assert n == n_bn and n > 0

"""F-07/F-08/F-09/F-10 model-level tests (SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.configs import presets
from gridgcn_tpu.models.build import build_model, example_inputs, init_model


def _rngs():
    return {"cagq": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}


def test_classifier_forward(rng_key):
    cfg = presets.get("synthetic_tiny")
    model, variables = init_model(cfg)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    logits = model.apply(variables, xyz, feat, mask, train=False,
                         rngs=_rngs())
    assert logits.shape == (2, cfg.model.num_classes)
    assert bool(jnp.isfinite(logits).all())


def test_segmentation_forward(rng_key):
    cfg = presets.get("synthetic_tiny_seg")
    model, variables = init_model(cfg)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    logits = model.apply(variables, xyz, feat, mask, train=False,
                         rngs=_rngs())
    assert logits.shape == (2, cfg.data.num_points, cfg.model.num_classes)
    assert bool(jnp.isfinite(logits).all())


def test_bfloat16_forward_matches_float32(rng_key):
    """Mixed-precision fidelity: the headline preset (scannet_whole_scene)
    runs the dense GCA/decoder math in bfloat16. With identical params
    (param_dtype stays f32; only compute dtype changes) and identical CAGQ
    indices (the index path is dtype-independent), bf16 predictions must
    agree with f32 almost everywhere."""
    import dataclasses

    cfg = presets.get("synthetic_tiny_seg")
    model32, variables = init_model(cfg)
    cfg16 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    model16 = build_model(cfg16.model)

    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    l32 = model32.apply(variables, xyz, feat, mask, train=False, rngs=_rngs())
    l16 = model16.apply(variables, xyz, feat, mask, train=False, rngs=_rngs())
    assert l16.dtype == jnp.float32          # logits head stays f32
    agree = float((jnp.argmax(l32, -1) == jnp.argmax(l16, -1)).mean())
    assert agree >= 0.98, f"bf16 argmax agreement {agree:.4f}"
    scale = float(jnp.abs(l32).max())
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                               atol=0.1 * scale)


def test_classifier_padding_invariance(rng_key):
    """Garbage in masked-out points must not change logits — the SURVEY §4.2
    mask-leak property test, end-to-end through GCA."""
    cfg = presets.get("synthetic_tiny")
    model, variables = init_model(cfg)
    B, N = 2, cfg.data.num_points
    xyz = jax.random.uniform(rng_key, (B, N, 3), minval=-1, maxval=1)
    mask = jnp.ones((B, N), bool).at[:, N - 40:].set(False)
    l1 = model.apply(variables, xyz, None, mask, train=False, rngs=_rngs())
    poisoned = xyz.at[:, N - 40:, :].set(77.7)
    l2 = model.apply(variables, poisoned, None, mask, train=False,
                     rngs=_rngs())
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_forward_deterministic_given_rngs(rng_key):
    cfg = presets.get("synthetic_tiny")
    model, variables = init_model(cfg)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    l1 = model.apply(variables, xyz, feat, mask, train=False, rngs=_rngs())
    l2 = model.apply(variables, xyz, feat, mask, train=False, rngs=_rngs())
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_candidates_context_pooling(rng_key):
    """Paper-faithful grid-context pooling over ALL stored context points
    (spec.context_pool_source='candidates', F-07)."""
    import dataclasses

    cfg = presets.get("synthetic_tiny")
    layers = tuple(dataclasses.replace(l, context_pool_source="candidates")
                   for l in cfg.model.layers)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, layers=layers))
    model, variables = init_model(cfg)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    logits = model.apply(variables, xyz, feat, mask, train=False,
                         rngs=_rngs())
    assert logits.shape == (2, cfg.model.num_classes)
    assert bool(jnp.isfinite(logits).all())
    # candidate indices respect the mask discipline end to end
    poisoned = xyz.at[:, -30:, :].set(55.5)
    m2 = mask.at[:, -30:].set(False)
    l1 = model.apply(variables, xyz, feat, m2, train=False, rngs=_rngs())
    l2 = model.apply(variables, poisoned, feat, m2, train=False,
                     rngs=_rngs())
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_all_presets_construct():
    for name in presets.PRESETS:
        cfg = presets.get(name)
        model = build_model(cfg.model)
        assert model is not None


def test_segmentation_forward_pallas_knn(rng_key):
    """Seg decoder with UpLayerSpec.method='pallas' (MXU flash-kNN,
    interpret mode off-TPU) produces finite logits of the right shape."""
    import dataclasses

    cfg = presets.get("synthetic_tiny_seg")
    ups = tuple(dataclasses.replace(u, method="pallas")
                for u in cfg.model.up_layers)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, up_layers=ups))
    model, variables = init_model(cfg)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    logits = model.apply(variables, xyz, feat, mask, train=False,
                         rngs=_rngs())
    assert logits.shape == (2, cfg.data.num_points, cfg.model.num_classes)
    assert bool(jnp.isfinite(logits).all())


def test_segmentation_pallas_knn_trainable(rng_key):
    """Gradients flow through the seg model when the decoder uses the Pallas
    kNN (indices/distances stop-gradient, features differentiate)."""
    import dataclasses

    cfg = presets.get("synthetic_tiny_seg")
    ups = tuple(dataclasses.replace(u, method="pallas")
                for u in cfg.model.up_layers)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, up_layers=ups))
    model, variables = init_model(cfg)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)

    def loss(params):
        v = {**variables, "params": params}
        logits = model.apply(v, xyz, feat, mask, train=False, rngs=_rngs())
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)

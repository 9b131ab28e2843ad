"""F-19/F-24 multi-chip tests on the 8-fake-device CPU mesh (SURVEY §4.2 #5).

Asserts sharded inference ≡ single-device inference and that the DP train
step runs and keeps state replicated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridgcn_tpu.configs import presets
from gridgcn_tpu.data.pipeline import make_dataset
from gridgcn_tpu.models.build import init_model
from gridgcn_tpu.parallel.dp import (
    make_parallel_eval_step, make_parallel_train_step)
from gridgcn_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from gridgcn_tpu.train.steps import (
    create_train_state, make_eval_step, make_train_step)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 fake devices"
    cfg = presets.get("synthetic_tiny")
    model, variables = init_model(cfg)
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes, "cls")
    state = create_train_state(cfg, model, variables, 8)
    mesh = make_mesh(8)
    return cfg, model, ds, state, mesh


def test_sharded_eval_matches_single_device(setup):
    cfg, model, ds, state, mesh = setup
    batch = next(ds.batches(8, seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(3)

    cm_single = make_eval_step(cfg, model)(state, batch, rng)

    p_eval = make_parallel_eval_step(cfg, model, mesh)
    cm_sharded = p_eval(replicate_tree(state, mesh),
                        shard_batch(batch, mesh),
                        replicate_tree(rng, mesh))
    np.testing.assert_array_equal(np.asarray(cm_single),
                                  np.asarray(cm_sharded))


def test_parallel_train_step_runs(setup):
    cfg, model, ds, state, mesh = setup
    batch = next(ds.batches(8, seed=1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(4)

    p_step = make_parallel_train_step(cfg, model, mesh, donate=False)
    new_state, metrics = p_step(replicate_tree(state, mesh),
                                shard_batch(batch, mesh),
                                replicate_tree(rng, mesh))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(new_state.step) == int(state.step) + 1
    # params changed and stayed finite
    leaves = jax.tree.leaves(new_state.params)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)


def test_parallel_grads_match_single_device(setup):
    """Sharded loss/grads equal single-device ones (up to fp reassociation).

    Compares raw gradients, not post-Adam params: Adam divides by sqrt(v), so
    near-zero-gradient entries amplify reassociation noise into O(lr)
    param differences that say nothing about DP correctness."""
    cfg, model, ds, state, mesh = setup
    batch = next(ds.batches(8, seed=2))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(5)

    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def loss_fn(params, batch, rng):
        k_cagq, k_drop = jax.random.split(rng)
        logits, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["xyz"], None, batch["mask"], train=True,
            rngs={"cagq": k_cagq, "dropout": k_drop},
            mutable=["batch_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean()

    grad_fn = jax.value_and_grad(loss_fn)
    s_loss, s_grads = jax.jit(grad_fn)(state.params, batch, rng)

    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("data"))
    p_grad_fn = jax.jit(grad_fn,
                        in_shardings=(rep, {k: sh for k in batch}, rep),
                        out_shardings=(rep, rep))
    p_loss, p_grads = p_grad_fn(replicate_tree(state.params, mesh),
                                shard_batch(batch, mesh),
                                replicate_tree(rng, mesh))

    np.testing.assert_allclose(float(s_loss), float(p_loss), rtol=1e-5)
    # atol covers reassociation noise on near-zero grad entries; rtol
    # guards the meaningful (large) entries.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4),
        jax.device_get(s_grads), jax.device_get(p_grads))


def test_comm_audit_accounting():
    """F-22/F-24 comm-volume audit (VERDICT r2 #6): the report's arithmetic
    is self-consistent and scales the right way with mesh size."""
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.parallel.comm_audit import comm_report

    cfg = presets.get("scannet_seg")
    r8 = comm_report(cfg, 8, compute_ms_per_step=1.5)
    r4 = comm_report(cfg, 4)

    # dp psum = ring cost over the exact parameter bytes
    assert r8["param_bytes"] > 1e6
    assert r8["dp"]["grad_psum_bytes"] == int(
        2 * 7 / 8 * r8["param_bytes"])

    # tier-2 all_gather rows = the full layer-1 level; ring all_gather
    # receives (D-1)/D of the assembled level, NOT the 2x psum factor
    # (ADVICE r3 #3)
    assert r8["tier2"]["all_gather_rows"] == cfg.model.layers[0].n_centers
    dt = jnp.dtype(cfg.model.dtype).itemsize   # bf16 features since r4
    row = 3 * 4 + cfg.model.layers[0].mlp[-1] * dt + 1
    assert r8["tier2"]["bytes_per_chip"] == int(
        7 / 8 * cfg.model.layers[0].n_centers * row)

    # tier-3 halo buffers shrink with the per-shard center share
    h8 = {l["level"]: l["H"] for l in r8["tier3"]["levels"]}
    h4 = {l["level"]: l["H"] for l in r4["tier3"]["levels"]}
    for lvl, spec in enumerate(cfg.model.layers):
        assert h8[lvl] == max(8, spec.n_centers // 8)
        assert h4[lvl] == max(8, spec.n_centers // 4)
    assert r8["tier3"]["bytes_per_dir_per_chip"] > 0

    # decoder refresh widths: level i is refreshed by decode stage
    # len(layers)-2-i with that stage's up-MLP output width; the deepest
    # level is the decoder's INPUT and is never refreshed (ADVICE r3 #2)
    n = len(cfg.model.layers)
    for lvl_rec in r8["tier3"]["levels"]:
        i, H = lvl_rec["level"], lvl_rec["H"]
        if i == n - 1:
            assert lvl_rec["refresh_bytes_per_dir"] == 0
        else:
            c_dec = cfg.model.up_layers[n - 2 - i].mlp[-1]
            assert lvl_rec["refresh_bytes_per_dir"] == H * c_dec * dt

    # GHOST-COMPUTE TAX (VERDICT r3 weak #2, per-config anchors round 5):
    # affine in the ghost/owned row ratio, with (fixed, coeff) from the
    # per-config / per-mode measured fits (MEASURED_GHOST_TAX) — for
    # scannet_seg the eval fit is 0.0147 + 0.0382·ratio; an UNMEASURED
    # config must fall back to the module-level eval fit (the steepest
    # measured slope, conservative)
    from gridgcn_tpu.parallel.comm_audit import (
        GHOST_TAX_COEFF, GHOST_TAX_FIXED, MEASURED_GHOST_TAX,
        ghost_compute_tax)

    tax = r8["tier3"]["ghost_compute_tax"]
    a = MEASURED_GHOST_TAX[("scannet_seg", "eval")]
    # ratio ~2x, not exactly: deepest level's H floors at 8 > its share of 4
    assert abs(tax - (a["fixed"] + 2 * a["coeff"])) < 0.01
    assert tax == ghost_compute_tax(cfg, 8)
    at = MEASURED_GHOST_TAX[("scannet_seg", "train")]
    tax_tr = r8["tier3"]["ghost_compute_tax_train"]
    assert abs(tax_tr - (at["fixed"] + 2 * at["coeff"])) < 0.01
    assert r8["tier3"]["train_tax_is_measured"]
    # unmeasured config (renamed) → the conservative module-level eval fit
    import dataclasses as _dc0
    cfg_unm = _dc0.replace(cfg, name="unmeasured")
    assert abs(ghost_compute_tax(cfg_unm, 8)
               - (GHOST_TAX_FIXED + 2 * GHOST_TAX_COEFF)) < 0.01
    proj = r8["projection"]
    c = 1.5
    expect_inf = c / (c * (1 + tax) + r8["tier3"]["time_ms"])
    assert abs(proj["tier3_inference_efficiency"] - expect_inf) < 1e-9
    assert 0.0 < proj["tier3_train_efficiency"] <= 1.0
    # halo traffic itself is still noise next to compute: the tax, not the
    # bytes, is what calibration has to shrink
    assert r8["tier3"]["time_ms"] < 0.02 * 1.5

    # calibrated (smaller) caps shrink the tax and lift the projection —
    # but only down to the fixed protocol term, never past it
    caps = tuple(max(8, l.n_centers // 8 // 4) for l in cfg.model.layers)
    r8c = comm_report(cfg, 8, ghost_cap=caps, compute_ms_per_step=1.5)
    assert GHOST_TAX_FIXED < r8c["tier3"]["ghost_compute_tax"] < 0.6 * tax
    assert (r8c["projection"]["tier3_inference_efficiency"]
            > proj["tier3_inference_efficiency"])
    assert r8c["projection"]["tier3_inference_efficiency"] > 0.9
    # and the per-level H in the report reflects the sequence
    hc = {l["level"]: l["H"] for l in r8c["tier3"]["levels"]}
    for lvl, c in enumerate(caps):
        assert hc[lvl] == c

    # TIER-2 REPLICATED-COMPUTE CHARGE (round 4, symmetric with the ghost
    # tax): tier 2 duplicates the coarse pyramid on every shard, so its
    # efficiency is compute / ((1-f)·compute + f·compute·D + t_ag) — NOT
    # compute / (compute + t_ag). The fraction is the real-chip busy-time
    # measurement for measured configs (scripts/study_tier2_compute.py),
    # the raw byte model otherwise.
    from gridgcn_tpu.parallel.comm_audit import (
        MEASURED_TIER2_REPL_FRAC, tier2_replicated_fraction)

    f = r8["tier2"]["replicated_frac"]
    assert f == tier2_replicated_fraction(cfg)
    # measured anchor wins for the pristine preset
    assert f == MEASURED_TIER2_REPL_FRAC["scannet_seg"]["frac"]
    assert 0.0 < f < 0.6                      # coarse pyramid is the tail
    # the raw model stays separately callable (falsifiable vs future runs)
    raw = tier2_replicated_fraction(cfg, anchored=False)
    assert raw != f and 0.0 < raw < 0.6
    # unmeasured config → falls back to the raw model
    import dataclasses as _dc
    cfg_unk = _dc.replace(cfg, name="not_a_measured_preset")
    assert (tier2_replicated_fraction(cfg_unk)
            == tier2_replicated_fraction(cfg_unk, anchored=False))
    # ANCHOR FINGERPRINT (VERDICT r4 weak #4 / ADVICE r4 #1): a config
    # that KEEPS the preset name but changes structure (here: one layer's
    # mlp width) must refuse the stale hardware measurement and fall back
    # to the raw byte model, with a warning
    import warnings as _warnings
    layers_mod = list(cfg.model.layers)
    layers_mod[1] = _dc.replace(layers_mod[1], mlp=(96, 96))
    cfg_mod = _dc.replace(
        cfg, model=_dc.replace(cfg.model, layers=tuple(layers_mod)))
    assert cfg_mod.name == "scannet_seg"      # same name, different config
    with _warnings.catch_warnings(record=True) as wrec:
        _warnings.simplefilter("always")
        f_mod = tier2_replicated_fraction(cfg_mod)
    assert any("stale anchor" in str(w.message) for w in wrec)
    assert f_mod == tier2_replicated_fraction(cfg_mod, anchored=False)
    assert f_mod != f
    c = 1.5
    expect = c / ((1 - f) * c + f * c * 8 + r8["tier2"]["time_ms"])
    assert abs(proj["tier2_inference_efficiency"] - expect) < 1e-9
    # the duplicated pyramid, not the all_gather bytes, is tier 2's cost
    assert proj["tier2_inference_efficiency"] < 0.9


def test_calibrate_ghost_cap_fits_and_shrinks():
    """`calibrate_ghost_cap` (VERDICT r3 #3): data-driven per-level ghost
    buffers produce ZERO overflow in the real tier-3 forward while staying
    well under the full-share default on a spread-out scene."""
    import warnings

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.resident_ml import (
        calibrate_ghost_cap, make_resident_ml_forward,
        resident_ml_seg_predict)

    import dataclasses

    # grids fine enough that a band (2 next-level voxels) is a small slab
    # fraction — the regime tier 3 is built for (slabs >> coarse voxels);
    # synthetic_tiny_seg's res-4 grid has bands wider than a slab, where
    # calibration CORRECTLY returns the full share
    base = presets.get("synthetic_tiny_seg")
    cfg = dataclasses.replace(base, model=dataclasses.replace(
        base.model,
        layers=(dataclasses.replace(base.model.layers[0], resolution=64,
                                    n_centers=512),
                dataclasses.replace(base.model.layers[1], resolution=32,
                                    n_centers=128)),
        up_layers=(dataclasses.replace(base.model.up_layers[0],
                                       resolution=32),
                   dataclasses.replace(base.model.up_layers[1],
                                       resolution=64))))
    D = 4
    rng = np.random.default_rng(11)
    N = 8192
    xyz = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    mask = np.ones(N, bool)

    caps = calibrate_ghost_cap(cfg, xyz, mask, D)
    shares = [max(1, l.n_centers // D) for l in cfg.model.layers]
    assert len(caps) == len(cfg.model.layers)
    assert all(8 <= c <= max(8, s) for c, s in zip(caps, shares))
    # a ~uniform scene's boundary bands hold a small fraction of each slab:
    # at least one level must calibrate BELOW its full share, else the
    # function never shrinks anything
    assert any(c < s for c, s in zip(caps, shares) if s > 8)

    _, variables = init_model(cfg)
    mesh = make_mesh(D)
    fwd = make_resident_ml_forward(cfg, mesh, ghost_cap=caps)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # overflow warns
        logits = resident_ml_seg_predict(
            cfg, variables, xyz, mask, mesh, ghost_cap=caps, fwd=fwd)
    assert logits.shape == (N, cfg.model.num_classes)
    assert np.isfinite(logits).all()


def test_resident_ml_predict_ghost_cap_auto():
    """ghost_cap='auto' calibrates per-level caps inside the predict helper
    and produces finite, fully-stitched logits (no overflow warning)."""
    import warnings

    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import init_model
    from gridgcn_tpu.parallel.mesh import make_mesh
    from gridgcn_tpu.parallel.resident_ml import resident_ml_seg_predict

    cfg = presets.get("synthetic_tiny_seg")
    _, variables = init_model(cfg)
    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    N = 2048
    xyz = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        logits = resident_ml_seg_predict(cfg, variables, xyz,
                                         np.ones(N, bool), mesh,
                                         ghost_cap="auto")
    assert logits.shape == (N, cfg.model.num_classes)
    assert np.isfinite(logits).all()

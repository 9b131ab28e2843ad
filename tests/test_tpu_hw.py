"""Opt-in real-hardware checks (GRIDGCN_TPU_TESTS=1 python -m pytest ...).

The default suite runs hermetically on the CPU backend (conftest pins
jax_platforms=cpu), where Pallas runs in interpret mode and XLA:CPU skips
the TPU-only simplifications these tests exist to catch (see
test_flash_knn_mxu_split_survives_lowering). These tests re-run the kernels
in a subprocess WITHOUT the CPU pin, i.e. on the real TPU, and assert
end-to-end numeric quality. They cost one remote compile each (~30 s) and
need the TPU queue, so they are opt-in.
"""

import os
import subprocess
import sys

import pytest

_ON = os.environ.get("GRIDGCN_TPU_TESTS") == "1"

_SCRIPT = r"""
import numpy as np, jax
from gridgcn_tpu.ops.pallas.knn import flash_knn_mxu, flash_knn
rng = np.random.default_rng(0)
Nq, Ns = 8192, 2048
q = rng.uniform(-1, 1, (Nq, 3)).astype(np.float32)
s = rng.uniform(-1, 1, (Ns, 3)).astype(np.float32)
qm = np.ones(Nq, bool); sm = np.ones(Ns, bool)
d2m, im, _ = jax.jit(lambda a,b,c,d: flash_knn_mxu(a,b,c,d,k=3))(q, qm, s, sm)
d2e, ie, _ = jax.jit(lambda a,b,c,d: flash_knn(a,b,c,d,k=3))(q, qm, s, sm)
im, ie = np.asarray(im), np.asarray(ie)
d2m = np.asarray(d2m, np.float64)
# exact kernel is the oracle: bit-exact vs brute force (verified on v5e)
top1 = float(np.mean(im[:, 0] == ie[:, 0]))
recall = float(np.mean([len(set(a) & set(b)) / 3 for a, b in zip(im, ie)]))
# numeric quality of d2 on the kernel's own picks, against f64 truth
true = ((q.astype(np.float64)[:, None, :] - s.astype(np.float64)[im]) ** 2).sum(-1)
d2err = float(np.abs(d2m - true).max())
assert top1 >= 0.99, f"top-1 vs exact kernel degraded: {top1}"
assert recall >= 0.98, f"3-NN recall vs exact kernel degraded: {recall}"
assert d2err < 1e-3, f"d2 numeric error vs f64 truth degraded: {d2err}"
print(f"OK top1={top1:.4f} recall={recall:.4f} d2err={d2err:.2e}")
"""


@pytest.mark.skipif(not _ON, reason="set GRIDGCN_TPU_TESTS=1 to run on TPU")
def test_flash_knn_mxu_accurate_on_hardware():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # use the default (TPU) backend
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"), repo] if p)
    out = subprocess.run([sys.executable, "-c", _SCRIPT], env=env, cwd=repo,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout


@pytest.mark.skipif(not _ON, reason="set GRIDGCN_TPU_TESTS=1 to run on TPU")
def test_preset_scale_convergence_cls_on_hardware():
    """Re-runs the modelnet40_full preset-scale convergence gate (VERDICT
    r2 #3) at reduced epochs and asserts the recorded target from
    accuracy_targets.json (modelnet40_full_shapes40, minus a short-run
    allowance — the recorded measured_r3 used 30 epochs; 12 epochs lands
    within a few points of the plateau). Minutes on a v5e chip."""
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = _json.load(open(os.path.join(
        repo, "gridgcn_tpu", "train", "accuracy_targets.json")))
    t = targets["modelnet40_full_shapes40"]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"), repo] if p)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convergence.py"),
         "--run", "cls", "--epochs-cls", "12"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    rec = _json.loads([l for l in out.stdout.splitlines()
                       if l.startswith('{"run"')][-1])
    floor = t["target"] - t["short_run_allowance"]
    assert rec["best"] >= floor, (
        f"preset-scale cls convergence regressed: best {rec['best']:.4f} "
        f"< {floor} (target {t['target']} - allowance)")


@pytest.mark.skipif(not _ON, reason="set GRIDGCN_TPU_TESTS=1 to run on TPU")
def test_preset_scale_convergence_s3dis_on_hardware():
    """Re-runs the s3dis_seg preset-scale convergence gate (VERDICT r3 #7)
    at reduced epochs: the FEATURED input path (in_channels=6, synthesized
    rgb-like + normalized-xyz features) at the preset's exact sizes. The
    recorded 60-epoch plateau is 0.999 mIoU; at 12 epochs the measured
    trajectory sits ≈0.93, inside the recorded short-run allowance."""
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = _json.load(open(os.path.join(
        repo, "gridgcn_tpu", "train", "accuracy_targets.json")))
    t = targets["s3dis_seg_surface"]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"), repo] if p)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convergence.py"),
         "--run", "s3dis", "--epochs-seg", "12"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    rec = _json.loads([l for l in out.stdout.splitlines()
                       if l.startswith('{"run"')][-1])
    floor = t["target"] - t["short_run_allowance"]
    assert rec["final_miou"] >= floor, (
        f"preset-scale s3dis convergence regressed: "
        f"{rec['final_miou']:.4f} < {floor}")


@pytest.mark.skipif(not _ON, reason="set GRIDGCN_TPU_TESTS=1 to run on TPU")
def test_preset_scale_convergence_field_on_hardware():
    """Re-runs the SENSITIVE preset-scale convergence gate (VERDICT r4 #4):
    the s3dis_seg preset on the feature-FIELD task, whose labels are
    thresholded smooth hidden fields observed only through noisy per-point
    features — decidable ONLY by neighborhood aggregation of features, with
    a mid-band plateau where a bf16-sized quality regression moves the
    metric instead of saturating (the modelnet40_full_shapes40 and
    s3dis_seg_surface gates plateau at 1.0/0.999 and are smoke checks, not
    regression detectors — see accuracy_targets.json)."""
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = _json.load(open(os.path.join(
        repo, "gridgcn_tpu", "train", "accuracy_targets.json")))
    t = targets["s3dis_seg_field"]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"), repo] if p)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convergence.py"),
         "--run", "field", "--epochs-seg", "12"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    rec = _json.loads([l for l in out.stdout.splitlines()
                       if l.startswith('{"run"')][-1])
    floor = t["target"] - t["short_run_allowance"]
    assert rec["final_overall_acc"] >= floor, (
        f"preset-scale FIELD convergence regressed: "
        f"{rec['final_overall_acc']:.4f} < {floor}")


@pytest.mark.skipif(not _ON, reason="set GRIDGCN_TPU_TESTS=1 to run on TPU")
def test_preset_scale_convergence_spatial_on_hardware():
    """Re-runs the spatially-sharded TRAIN quality gate (round 5): the
    scannet_seg preset trained tier-3 spatially (mesh=1, whole scenes)
    must reach the recorded held-out mIoU band under the monolithic
    running-stats eval — the protocol that caught the BN running-stat
    threading bug (a broken spatial checkpoint evals at ~chance 0.25,
    far below any floor here; accuracy_targets.json
    scannet_seg_surface_spatial)."""
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = _json.load(open(os.path.join(
        repo, "gridgcn_tpu", "train", "accuracy_targets.json")))
    t = targets["scannet_seg_surface_spatial"]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH"), repo] if p)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convergence.py"),
         "--run", "spatial", "--epochs-seg", "12"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    rec = _json.loads([l for l in out.stdout.splitlines()
                       if l.startswith('{"run"')][-1])
    floor = t["target"] - t["short_run_allowance"]
    assert rec["final_miou"] >= floor, (
        f"spatially-sharded TRAIN quality regressed: held-out mIoU "
        f"{rec['final_miou']:.4f} < {floor} (a running-stat recurrence "
        f"reads ~0.1)")
    assert rec["ghost_overflow"] == 0

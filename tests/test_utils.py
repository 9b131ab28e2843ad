"""Aux subsystems: capacity audit, metrics summaries, logging."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridgcn_tpu.ops import build_voxel_table
from gridgcn_tpu.train.metrics import confusion_matrix, summarize_confusion
from gridgcn_tpu.utils.debug import check_capacity
from gridgcn_tpu.utils.logging import MetricLogger


def test_check_capacity_flags_overflow(rng_key):
    xyz = jax.random.uniform(rng_key, (1, 500, 3))
    mask = jnp.ones((1, 500), bool)
    ok = build_voxel_table(xyz, mask, 8, 500, rng_key)
    check_capacity(ok)   # no drops
    tight = build_voxel_table(xyz, mask, 2, 2, rng_key)  # 8 voxels, nv=2
    with pytest.raises(ValueError, match="drops"):
        check_capacity(tight, max_dropped_frac=0.05)


def test_confusion_matrix_and_summary():
    logits = jnp.asarray([[5.0, 0, 0], [0, 5.0, 0], [0, 5.0, 0], [0, 0, 5.0]])
    labels = jnp.asarray([0, 1, 2, 2])
    cm = confusion_matrix(logits, labels, 3)
    np.testing.assert_array_equal(
        np.asarray(cm), [[1, 0, 0], [0, 1, 0], [0, 1, 1]])
    s = summarize_confusion(cm)
    assert abs(float(s["overall_acc"]) - 0.75) < 1e-6
    # class accs: 1, 1, 0.5 → mean 5/6
    assert abs(float(s["mean_class_acc"]) - 5 / 6) < 1e-6


def test_confusion_matrix_masked():
    logits = jnp.zeros((1, 4, 2)).at[0, :, 0].set(1.0)   # all predict 0
    labels = jnp.asarray([[0, 0, 1, 1]])
    mask = jnp.asarray([[True, True, True, False]])
    cm = confusion_matrix(logits, labels, 2, mask)
    np.testing.assert_array_equal(np.asarray(cm), [[2, 0], [1, 0]])


def test_metric_logger_jsonl():
    buf = io.StringIO()
    log = MetricLogger(stream=buf)
    log.log("train_step", step=3, loss=0.5,
            arr=jnp.asarray(1.25), vec=np.array([1, 2]))
    rec = json.loads(buf.getvalue())
    assert rec["kind"] == "train_step" and rec["loss"] == 0.5
    assert rec["arr"] == 1.25 and rec["vec"] == [1, 2]


def test_metric_logger_tensorboard(tmp_path):
    """SURVEY §5 metrics: 'stdout JSONL + TensorBoard scalars' — numeric
    metrics become scalar events readable back from the event file."""
    tb = str(tmp_path / "tb")
    log = MetricLogger(stream=io.StringIO(), tensorboard_dir=tb)
    log.log("train_step", step=3, loss=0.5, note="skipped-non-numeric")
    log.log("epoch", epoch=1, acc=0.75)
    log.close()

    import tensorflow as tf
    files = list((tmp_path / "tb").iterdir())
    assert files, "no TensorBoard event file written"
    tags = {}
    for f in files:
        for rec in tf.data.TFRecordDataset(str(f)):
            ev = tf.compat.v1.Event.FromString(rec.numpy())
            for v in ev.summary.value:
                tags[v.tag] = v.simple_value or tf.make_ndarray(v.tensor)
    assert "train_step/loss" in tags and "epoch/acc" in tags
    assert float(tags["train_step/loss"]) == 0.5
    assert not any(t.endswith("note") for t in tags)


def test_prefetcher_order_and_errors():
    """Prefetcher yields batches in order and re-raises worker exceptions."""
    from gridgcn_tpu.data.pipeline import Prefetcher

    out = list(Prefetcher(iter(range(7)), lambda x: x * 2, depth=3))
    assert out == [0, 2, 4, 6, 8, 10, 12]

    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    import pytest

    pf = Prefetcher(bad_gen(), lambda x: x)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="boom"):
        for _ in pf:
            pass


def test_traceview_exclusive_attribution():
    """Innermost-active attribution: overlapped async spans are charged
    only for time nothing runs inside them; values sum to busy time."""
    from gridgcn_tpu.utils.traceview import exclusive_times

    # copy-start [0, 100) wraps fusion.a [10, 40) and fusion.b [60, 80)
    events = [(0, 100, "copy"), (10, 40, "a"), (60, 80, "b")]
    excl = exclusive_times(events)
    assert excl == {"copy": 50, "a": 30, "b": 20}
    assert sum(excl.values()) == 100  # == busy span (no idle)

    # nested same-name and zero-length events
    events = [(0, 10, "x"), (2, 8, "x"), (5, 5, "zero")]
    excl = exclusive_times(events)
    assert excl == {"x": 10}

    # disjoint with idle gap: busy = 6, not span (=10)
    excl = exclusive_times([(0, 4, "p"), (8, 10, "q")])
    assert excl == {"p": 4, "q": 2}

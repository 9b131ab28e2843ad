"""F-16: evaluation metrics as on-device confusion-matrix accumulators
(SURVEY.md §2.3): overall accuracy + mean per-class accuracy (ModelNet40),
per-point/voxel accuracy (ScanNet), mIoU (S3DIS). The confusion matrix lives
on device as a [C, C] int array and is summed across batches (and across
chips via jit's automatic reduction when sharded)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(logits: jax.Array, labels: jax.Array,
                     num_classes: int, mask: jax.Array | None = None
                     ) -> jax.Array:
    """Confusion matrix [C, C] (rows = truth, cols = prediction).

    Works for cls (labels [B]) and seg (labels [B, N], mask [B, N]).
    """
    preds = jnp.argmax(logits, axis=-1)
    labels = labels.reshape(-1)
    preds = preds.reshape(-1)
    idx = labels * num_classes + preds
    ones = jnp.ones_like(idx, jnp.int32)
    if mask is not None:
        m = mask.reshape(-1)
        idx = jnp.where(m, idx, num_classes * num_classes)
        ones = jnp.where(m, ones, 0)
    cm = jnp.zeros((num_classes * num_classes + 1,), jnp.int32).at[idx].add(ones)
    return cm[:-1].reshape(num_classes, num_classes)


def summarize_confusion(cm: jax.Array) -> dict:
    """OA, mean per-class accuracy, mIoU, per-class IoU from a [C, C] matrix."""
    cm = cm.astype(jnp.float32)
    total = jnp.sum(cm)
    diag = jnp.diagonal(cm)
    row = jnp.sum(cm, axis=1)   # ground-truth counts
    col = jnp.sum(cm, axis=0)   # prediction counts
    present = row > 0
    oa = jnp.sum(diag) / jnp.maximum(total, 1.0)
    class_acc = jnp.where(present, diag / jnp.maximum(row, 1.0), 0.0)
    mean_class_acc = jnp.sum(class_acc) / jnp.maximum(jnp.sum(present), 1.0)
    union = row + col - diag
    iou = jnp.where(present, diag / jnp.maximum(union, 1.0), 0.0)
    miou = jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1.0)
    return {
        "overall_acc": oa,
        "mean_class_acc": mean_class_acc,
        "miou": miou,
        "iou_per_class": iou,
    }


def voxel_confusion(xyz, logits, labels, mask, voxel_size: float,
                    num_classes: int):
    """ScanNet per-VOXEL confusion (SURVEY §2.3 F-16 'per-voxel accuracy'):
    the reference projects point predictions onto a voxel grid and scores
    each occupied voxel once — majority point label vs majority predicted
    class per voxel — so dense regions don't dominate the metric. Host-side
    NumPy (eval-time only, not a hot path). Returns a [C, C] matrix summable
    across scenes."""
    import numpy as np

    xyz = np.asarray(xyz).reshape(-1, 3)
    preds = np.asarray(jnp.argmax(jnp.asarray(logits), -1)).reshape(-1)
    labels = np.asarray(labels).reshape(-1)
    m = np.asarray(mask).reshape(-1).astype(bool)
    xyz, preds, labels = xyz[m], preds[m], labels[m]
    if xyz.shape[0] == 0:
        return np.zeros((num_classes, num_classes), np.int64)

    v = np.floor((xyz - xyz.min(0)) / voxel_size).astype(np.int64)
    dims = v.max(0) + 1
    vid = (v[:, 0] * dims[1] + v[:, 1]) * dims[2] + v[:, 2]
    # majority vote per voxel for both label and prediction via a dense
    # (voxel, class) histogram over the occupied voxels only
    uniq, inv = np.unique(vid, return_inverse=True)
    lab_hist = np.zeros((len(uniq), num_classes), np.int64)
    np.add.at(lab_hist, (inv, labels), 1)
    pred_hist = np.zeros((len(uniq), num_classes), np.int64)
    np.add.at(pred_hist, (inv, preds), 1)
    vlab = lab_hist.argmax(1)
    vpred = pred_hist.argmax(1)
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (vlab, vpred), 1)
    return cm


def merge_block_logits(positions, logits, masks, quant: float = 1e-3):
    """S3DIS room-level block merging (SURVEY §2.3 F-16 'whole-scene
    evaluation by block-merging'): blocks of one room are merged back into
    room points by quantizing each point's room-frame position; a point
    sampled into several (overlapping) blocks has its logits SUMMED (logit
    voting), so the room is scored once per physical point. Returns
    (merged_logits [P, C], first-occurrence index [P] into the flat block
    points) for carrying labels alongside."""
    import numpy as np

    pos = np.asarray(positions).reshape(-1, positions.shape[-1])
    lg = np.asarray(logits).reshape(-1, logits.shape[-1])
    m = np.asarray(masks).reshape(-1).astype(bool)
    pos, lg = pos[m], lg[m]
    keys = np.round(pos / quant).astype(np.int64)
    # lexicographic unique over quantized coords
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    merged = np.zeros((len(uniq), lg.shape[-1]), np.float64)
    np.add.at(merged, inv, lg.astype(np.float64))
    first = np.full(len(uniq), -1, np.int64)
    flat_idx = np.nonzero(m)[0]
    # first occurrence: reverse fill so earlier indices win
    first[inv[::-1]] = flat_idx[::-1]
    return merged, first

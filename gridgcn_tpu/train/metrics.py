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

"""F-15: jitted train/eval steps (SURVEY.md §2.3, §3.1).

The whole step — on-device augmentation (F-14), CAGQ index building, forward,
loss, backward, optimizer — is one jit region, so nothing round-trips to the
host (the reference's host-side data iterator bottleneck is gone, SURVEY
§3.1). Gradients flow through the dense GCA math only; CAGQ emits integer
index tensors which XLA treats as non-differentiable, matching the
reference's zero-backward custom op (F-06).

PRNG discipline (SURVEY §7 H6): one key per step derived by folding the step
counter into the run key; split into augment / cagq / dropout streams.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax.training import train_state

from gridgcn_tpu.configs.base import Config
from gridgcn_tpu.data.augment import augment_batch
from gridgcn_tpu.train.metrics import confusion_matrix


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    t = cfg.train
    total = max(1, t.epochs * steps_per_epoch)
    if t.lr_schedule == "cosine":
        return optax.cosine_decay_schedule(t.lr, total, alpha=0.01)
    if t.lr_schedule == "step":
        return optax.exponential_decay(
            t.lr, t.lr_decay_steps, t.lr_decay_rate, staircase=True)
    if t.lr_schedule == "const":
        return optax.constant_schedule(t.lr)
    raise ValueError(f"unknown lr_schedule: {t.lr_schedule}")


def make_optimizer(cfg: Config, steps_per_epoch: int):
    t = cfg.train
    sched = make_lr_schedule(cfg, steps_per_epoch)
    if t.weight_decay > 0:
        opt = optax.adamw(sched, weight_decay=t.weight_decay)
    else:
        opt = optax.adam(sched)
    if t.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(t.grad_clip), opt)
    return opt, sched


def create_train_state(cfg: Config, model: nn.Module, variables: dict,
                       steps_per_epoch: int) -> TrainState:
    opt, _ = make_optimizer(cfg, steps_per_epoch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=opt,
    )


def _loss_and_logits(cfg: Config, logits: jax.Array, batch: dict,
                     class_weights: Optional[jax.Array] = None):
    labels = batch["label"]
    ls = cfg.train.label_smoothing
    if cfg.model.task == "cls":
        if ls > 0:
            onehot = optax.smooth_labels(
                jax.nn.one_hot(labels, cfg.model.num_classes), ls)
            loss = optax.softmax_cross_entropy(logits, onehot).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, acc
    # seg: per-point CE, masked, optionally inverse-frequency weighted.
    # One-hot formulation, NOT softmax_cross_entropy_with_integer_labels:
    # optax's integer-label path lowers the label pick to a row gather
    # (and a row scatter in the backward), which runs at the ~100 M rows/s
    # gather floor — 0.8 ms each way on 65K points in scannet_seg traces.
    # num_classes is small, so logits·one_hot is a fused elementwise pass.
    onehot = jax.nn.one_hot(labels, cfg.model.num_classes,
                            dtype=logits.dtype)
    ce = optax.softmax_cross_entropy(
        logits, optax.smooth_labels(onehot, ls) if ls > 0 else onehot)
    mask = batch["mask"]
    if cfg.model.ignore_label is not None:
        # reference ScanNet protocol: unannotated points (label 0) carry no
        # loss and no accuracy weight
        mask = mask & (labels != cfg.model.ignore_label)
    w = mask.astype(ce.dtype)
    if class_weights is not None:
        # same trick: class_weights[labels] is a gather; ride the (hard,
        # unsmoothed) one-hot so the per-point weight stays the label's own
        w = w * jnp.sum(onehot * class_weights.astype(ce.dtype), axis=-1)
    denom = jnp.maximum(jnp.sum(w), 1e-6)
    loss = jnp.sum(ce * w) / denom
    n = jnp.maximum(jnp.sum(mask), 1)
    acc = jnp.sum(jnp.where(mask, jnp.argmax(logits, -1) == labels, False)) / n
    return loss, acc


def class_weights_from_dataset(labels, num_classes: int,
                               ignore_label: int | None = None) -> jax.Array:
    """Inverse-sqrt-frequency class weights (seg), via the native histogram.
    The ignore class (reference ScanNet: label 0 = unannotated) gets weight
    0 and is excluded from the frequency normalization."""
    from gridgcn_tpu.data import native
    hist = native.label_histogram(np.asarray(labels), num_classes
                                  ).astype(np.float64)
    if ignore_label is not None:
        hist[ignore_label] = 0.0
    freq = hist / max(hist.sum(), 1.0)
    w = 1.0 / np.sqrt(freq + 1e-4)
    if ignore_label is not None:
        w[ignore_label] = 0.0
        w = w / w[w > 0].mean() if (w > 0).any() else w
    else:
        w = w / w.mean()
    return jnp.asarray(w, jnp.float32)


def build_train_step(cfg: Config, model: nn.Module, sched=None,
                     class_weights: Optional[jax.Array] = None):
    """Raw (unjitted) (state, batch, rng) → (state, metrics) step."""

    def step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        k_aug, k_cagq, k_drop = jax.random.split(rng, 3)
        xyz, mask, feat = augment_batch(
            batch["xyz"], batch["mask"], k_aug, cfg.data,
            feat=batch.get("feat", None))

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xyz, feat, mask, train=True,
                rngs={"cagq": k_cagq, "dropout": k_drop},
                mutable=["batch_stats"])
            loss, acc = _loss_and_logits(
                cfg, logits, {**batch, "mask": mask}, class_weights)
            return loss, (acc, updates)

        (loss, (acc, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"])
        metrics = {"loss": loss, "acc": acc,
                   "grad_norm": optax.global_norm(grads)}
        if sched is not None:
            metrics["lr"] = sched(state.step)
        return state, metrics

    return step


def make_train_step(cfg: Config, model: nn.Module, sched=None,
                    donate: bool = True, class_weights=None):
    """Jitted (state, batch, rng) → (state, metrics) step."""
    return jax.jit(build_train_step(cfg, model, sched, class_weights),
                   donate_argnums=(0,) if donate else ())


def _confusion_mask(cfg: Config, batch: dict):
    """Confusion-matrix weighting for an eval batch: per-point mask for seg,
    none for cls — in both cases excluding the duplicate clouds that pad the
    final partial batch (batch['example_mask'], data/pipeline.py), which
    would otherwise be double-counted in OA/mIoU."""
    em = batch.get("example_mask")
    if cfg.model.task == "seg":
        mask = batch["mask"]
        if cfg.model.ignore_label is not None:
            mask = mask & (batch["label"] != cfg.model.ignore_label)
        return mask & em[:, None] if em is not None else mask
    return em


def build_eval_step(cfg: Config, model: nn.Module):
    """Raw (unjitted) (state, batch, rng) → confusion-matrix [C, C] step."""

    def step(state: TrainState, batch: dict, rng: jax.Array):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = model.apply(
            variables, batch["xyz"], batch.get("feat", None), batch["mask"],
            train=False, rngs={"cagq": rng})
        mask = _confusion_mask(cfg, batch)
        return confusion_matrix(logits, batch["label"],
                                cfg.model.num_classes, mask)

    return step


def make_eval_step(cfg: Config, model: nn.Module):
    """Jitted (state, batch, rng) → confusion-matrix [C, C] step."""
    return jax.jit(build_eval_step(cfg, model))


def make_voting_eval_step(cfg: Config, model: nn.Module, votes: int):
    """Jitted rotation-voting eval step (the reference-lineage ModelNet40
    test protocol): each vote rotates the cloud 2πv/votes about the up (y)
    axis and fresh CAGQ randomness is drawn; logits are averaged before the
    confusion matrix. votes=1 ≡ build_eval_step."""

    geo = tuple(cfg.data.feat_geo_channels)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        xyz = batch["xyz"]
        acc = None
        for v in range(votes):
            theta = 2.0 * jnp.pi * v / votes
            c, s = jnp.cos(theta), jnp.sin(theta)
            rot = jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0],
                               [-s, 0.0, c]], xyz.dtype)
            feat = batch.get("feat", None)
            if feat is not None and geo:
                # rotate xyz-like feature columns (cfg.data.feat_geo_channels,
                # e.g. s3dis normalized room xyz) with the cloud so every
                # vote sees consistent inputs (ADVICE r1 #1)
                assert len(geo) == 3, "feat_geo_channels must name 3 columns"
                gidx = jnp.asarray(geo)
                feat = feat.at[..., gidx].set(feat[..., gidx] @ rot)
            logits = model.apply(
                variables, xyz @ rot, feat,
                batch["mask"], train=False,
                rngs={"cagq": jax.random.fold_in(rng, v)})
            acc = logits if acc is None else acc + logits
        mask = _confusion_mask(cfg, batch)
        return confusion_matrix(acc, batch["label"],
                                cfg.model.num_classes, mask)

    return jax.jit(step)

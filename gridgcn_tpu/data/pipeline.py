"""F-11/F-12/F-13 + host-side batching (SURVEY.md §2.3).

Loaders produce whole-split numpy arrays once; batching is a thin shuffled
iterator. Everything per-point (normalization, augmentation) runs on device
inside the jitted train/eval step (BASELINE north_star: "data loading,
normalization, and augmentation run as a jit-compiled preprocessing
front-end"), so the host path is just `np.take` + `device_put`.

Real-dataset loaders (ModelNet40 HDF5, S3DIS npy blocks, ScanNet pickle)
activate when their files exist under `cfg.root`; otherwise `make_dataset`
falls back to the synthetic generators so tests/bench run hermetically.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional

import numpy as np

from gridgcn_tpu.configs.base import DataConfig
from gridgcn_tpu.data import native, synthetic
from gridgcn_tpu.data.modelnet40 import load_modelnet40
from gridgcn_tpu.data.s3dis import load_s3dis
from gridgcn_tpu.data.scannet import load_scannet


@dataclasses.dataclass
class Dataset:
    """A fully materialized split: points [S,N,3], labels [S] or [S,N]."""
    points: np.ndarray
    labels: np.ndarray
    features: Optional[np.ndarray] = None   # [S, N, C] extra per-point feats
    task: str = "cls"
    num_classes: int = 0

    @property
    def size(self) -> int:
        return self.points.shape[0]

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, self.size // batch_size)

    def batches(self, batch_size: int, seed: int = 0,
                shuffle: bool = True, drop_last: bool = True
                ) -> Iterator[dict]:
        """Yield one epoch of numpy batches (static batch size)."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(self.size) if shuffle else np.arange(self.size)
        n = self.size
        stop = (n // batch_size) * batch_size if drop_last else n
        if stop == 0:
            stop = n
        for s in range(0, stop, batch_size):
            idx = order[s:s + batch_size]
            n_real = len(idx)
            if n_real < batch_size:   # pad the final partial batch
                pad = rng.choice(order, batch_size - n_real)
                idx = np.concatenate([idx, pad])
            idx = np.ascontiguousarray(idx, np.int32)
            xyz = native.gather_rows(self.points, idx)   # threaded C++ path
            # pad rows are duplicate clouds kept only for the static batch
            # shape; example_mask lets eval steps exclude them from the
            # confusion matrix (they'd otherwise bias OA/mIoU ~1% on splits
            # that don't divide the batch size)
            example_mask = np.zeros(batch_size, bool)
            example_mask[:n_real] = True
            batch = {
                "xyz": xyz,
                "label": native.gather_rows(self.labels, idx),
                "mask": np.ones(xyz.shape[:2], bool),
                "example_mask": example_mask,
            }
            if self.features is not None:
                batch["feat"] = native.gather_rows(self.features, idx)
            yield batch


def make_dataset(cfg: DataConfig, split: str, num_classes: int,
                 task: str) -> Dataset:
    """Build a split for a config; fall back to synthetic when files absent."""
    root = cfg.root
    if cfg.dataset == "modelnet40" and os.path.isdir(
            os.path.join(root, "modelnet40_ply_hdf5_2048")):
        pts, labels = load_modelnet40(root, split, cfg.num_points)
        return Dataset(pts, labels, task="cls", num_classes=40)
    if cfg.dataset == "s3dis" and os.path.isdir(os.path.join(root, "s3dis")):
        pts, feats, labels = load_s3dis(root, split, cfg.num_points,
                                        holdout=cfg.s3dis_holdout)
        return Dataset(pts, labels, features=feats, task="seg",
                       num_classes=13)
    if cfg.dataset == "scannet" and os.path.isdir(
            os.path.join(root, "scannet")):
        pts, labels = load_scannet(root, split, cfg.num_points)
        return Dataset(pts, labels, task="seg", num_classes=21)

    if cfg.dataset == "synthetic_shapes40":
        # 40-class shape-family ModelNet40 stand-in (VERDICT r2 #3):
        # preset-scale convergence evidence for the classification configs
        base = cfg.synthetic_size or 1600
        n = base if split == "train" else max(base // 4, 40)
        pts, labels = synthetic.synthetic_shapes40(
            n, cfg.num_points, seed=0 if split == "train" else 1)
        return Dataset(pts, labels, task="cls", num_classes=40)

    if cfg.dataset == "synthetic_scene":
        # surface-like indoor scenes with part labels (floor/ceiling/wall/
        # object) — a semantically meaningful whole-scene seg stand-in
        # whose density statistics match real scans (data/synthetic.py)
        base = cfg.synthetic_size or 24
        n = base if split == "train" else max(base // 3, 8)
        seed0 = 0 if split == "train" else 1000
        out = [synthetic.synthetic_scene_surface(
            cfg.num_points, seed=seed0 + i, return_labels=True)
            for i in range(n)]
        pts = np.stack([p for p, _ in out])
        labels = np.stack([l for _, l in out])
        feats = None
        if cfg.num_feats > 0:
            # rgb-like + normalized-xyz features so featured configs
            # (s3dis_seg: in_channels=6, feat cols 3:6 xyz-like — SURVEY
            # §2.3 F-13) have a preset-scale convergence stand-in
            # (VERDICT r3 #7). rgb correlates with the part class the way
            # real scans' colors correlate with semantics: a per-class
            # palette, tinted per scene, with per-point noise.
            rngf = np.random.default_rng(seed0 + 7777)
            palette = np.array([[0.55, 0.45, 0.35],   # floor
                                [0.92, 0.92, 0.90],   # ceiling
                                [0.75, 0.70, 0.60],   # wall
                                [0.30, 0.50, 0.70]])  # object
            rgb = palette[labels]                      # [n, N, 3]
            rgb = rgb + rngf.normal(0, 0.1, (n, 1, 3))        # scene tint
            rgb = np.clip(rgb + rngf.normal(0, 0.05, rgb.shape), 0, 1)
            mins = pts.min(axis=1, keepdims=True)
            span = np.maximum(pts.max(axis=1, keepdims=True) - mins, 1e-6)
            nxyz = (pts - mins) / span
            feats = np.concatenate([rgb, nxyz], axis=-1)[
                ..., :cfg.num_feats].astype(np.float32)
        return Dataset(pts, labels, features=feats, task="seg",
                       num_classes=4)

    if cfg.dataset == "synthetic_field":
        # labels = thresholded smooth hidden fields observed only through
        # NOISY per-point features: per-point evidence is ~chance, a
        # neighborhood aggregate is ~0.9 — the mid-band convergence-gate
        # task (VERDICT r4 #4; generator docstring in data/synthetic.py)
        base = cfg.synthetic_size or 24
        n = base if split == "train" else max(base // 3, 8)
        seed0 = 0 if split == "train" else 1000
        out = [synthetic.synthetic_feature_field(
            cfg.num_points, seed=seed0 + i,
            num_feats=max(cfg.num_feats, 2)) for i in range(n)]
        pts = np.stack([p for p, _, _ in out])
        feats = (np.stack([f for _, f, _ in out])[..., :cfg.num_feats]
                 if cfg.num_feats > 0 else None)
        labels = np.stack([l for _, _, l in out])
        return Dataset(pts, labels, features=feats, task="seg",
                       num_classes=4)

    # hermetic fallback (also cfg.dataset == 'synthetic')
    n = 64 if split == "train" else 32
    if task == "cls":
        pts, labels = synthetic.synthetic_classification(
            n, cfg.num_points, num_classes, seed=0 if split == "train" else 1)
    else:
        pts, labels = synthetic.synthetic_segmentation(
            n, cfg.num_points, num_classes, seed=0 if split == "train" else 1)
    feats = None
    if cfg.num_feats > 0:
        rng = np.random.default_rng(7)
        feats = rng.uniform(0, 1, size=(n, cfg.num_points, cfg.num_feats)
                            ).astype(np.float32)
    return Dataset(pts, labels, features=feats, task=task,
                   num_classes=num_classes)


class Prefetcher:
    """Background-thread batch prefetch (host↔device pipelining, F-15).

    Assembles up to `depth` upcoming batches (threaded C++ row gathers,
    data/native.py) and stages them on device while the current step runs,
    so the feeder overlaps device compute — the reference's iterator was
    synchronous and host-bound (SURVEY §3.1). `put` is the device-placement
    function (jax.device_put / shard_batch); exceptions in the worker are
    re-raised at the consuming `next()`."""

    _SENTINEL = object()

    def __init__(self, batches, put, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(1, depth))
        self._err = None

        def run():
            try:
                for b in batches:
                    self._q.put(put(b))
            except BaseException as e:     # noqa: BLE001 — re-raised below
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

"""Synthetic datasets for tests, the overfit integration gate (SURVEY §4.2),
and benchmarking when real datasets are not on disk."""

from __future__ import annotations

import numpy as np


def synthetic_classification(num_clouds: int, num_points: int,
                             num_classes: int = 4, seed: int = 0):
    """Geometrically distinguishable shape classes: sphere surface, cube
    surface, two-cluster blob, cylinder surface (cycled for >4 classes)."""
    rng = np.random.default_rng(seed)
    pts = np.zeros((num_clouds, num_points, 3), np.float32)
    labels = np.arange(num_clouds) % num_classes

    for i, lab in enumerate(labels):
        kind = lab % 4
        if kind == 0:       # sphere surface
            v = rng.normal(size=(num_points, 3))
            p = v / np.linalg.norm(v, axis=1, keepdims=True)
        elif kind == 1:     # cube surface
            p = rng.uniform(-1, 1, size=(num_points, 3))
            ax = rng.integers(0, 3, num_points)
            sign = rng.choice([-1.0, 1.0], num_points)
            p[np.arange(num_points), ax] = sign
        elif kind == 2:     # two clusters
            c = rng.choice([-0.6, 0.6], num_points)
            p = rng.normal(scale=0.25, size=(num_points, 3))
            p[:, 0] += c
        else:               # cylinder surface
            theta = rng.uniform(0, 2 * np.pi, num_points)
            z = rng.uniform(-1, 1, num_points)
            p = np.stack([np.cos(theta), z, np.sin(theta)], 1)
        pts[i] = p + rng.normal(scale=0.02, size=(num_points, 3))
    return pts, labels.astype(np.int32)


def synthetic_segmentation(num_clouds: int, num_points: int,
                           num_classes: int = 4, seed: int = 0):
    """Per-point labels derivable from geometry (spatial quadrant)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, size=(num_clouds, num_points, 3)).astype(np.float32)
    qx = (pts[..., 0] > 0).astype(np.int32)
    qy = (pts[..., 1] > 0).astype(np.int32)
    labels = (qx * 2 + qy) % num_classes
    return pts, labels.astype(np.int32)

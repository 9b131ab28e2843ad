"""F-10: GridGCN segmentation network (S3DIS / ScanNet), SURVEY.md §2.2, §3.4.

PointNet++-style encoder–decoder built from GridConv stages:
  encoder: cfg.layers GridConv downsampling stages (levels cached for skips)
  decoder: per stage — F-05 grid 3-NN query (gridify_up equivalent) +
           inverse-distance interpolation + skip-concat + shared MLP
  head:    per-point MLP → class logits.

Whole-scene inference (BASELINE config 5, the headline throughput benchmark)
is this same module applied at 80K+ points with batch sharded across chips
(gridgcn_tpu.parallel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gridgcn_tpu.configs.base import ModelConfig
from gridgcn_tpu.models.gridconv import GridConv
from gridgcn_tpu.ops.upsample import (
    dense_three_nn, grid_three_nn, three_nn_interpolate)

# above this coarse-level size the voxel-table query wins over MXU brute force
_DENSE_KNN_MAX_SUPPORT = 16384


class GridGCNSegmentation(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xyz: jax.Array, feat: Optional[jax.Array],
                 mask: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        if len(cfg.up_layers) != len(cfg.layers):
            raise ValueError("seg model needs one up_layer per encoder layer")

        if cfg.use_xyz_feature:
            # absolute position as an input feature (PointNet++ convention)
            feat = xyz if feat is None else jnp.concatenate([xyz, feat], -1)

        # ---- encoder ----
        conv_cls = nn.remat(GridConv, static_argnums=(4,)) if cfg.remat \
            else GridConv
        levels = [(xyz, feat, mask)]
        for i, spec in enumerate(cfg.layers):
            xyz, feat, mask = conv_cls(spec, dtype=dtype,
                                       bn_momentum=cfg.bn_momentum,
                                       name=f"gridconv{i}")(
                xyz, feat, mask, train)
            levels.append((xyz, feat, mask))

        # ---- decoder: feature propagation coarse → dense ----
        c_xyz, c_feat, c_mask = levels[-1]
        for i, up in enumerate(cfg.up_layers):
            d_xyz, d_feat, d_mask = levels[-2 - i]
            use_dense = (up.method == "dense"
                         or (up.method == "auto"
                             and c_xyz.shape[1] <= _DENSE_KNN_MAX_SUPPORT))
            if up.method == "pallas":
                from gridgcn_tpu.ops.pallas.knn import flash_three_nn
                # interpret mode off-TPU so CPU tests/dryruns stay runnable
                nn_idx, weights, _ = flash_three_nn(
                    d_xyz, d_mask, c_xyz, c_mask, k=up.k_interp,
                    interpret=jax.default_backend() != "tpu")
            elif use_dense:
                nn_idx, weights, _ = dense_three_nn(
                    d_xyz, d_mask, c_xyz, c_mask, k=up.k_interp,
                    approx=up.approx_knn)
            else:
                key = self.make_rng("cagq")
                nn_idx, weights, _ = grid_three_nn(
                    d_xyz, d_mask, c_xyz, c_mask, up.resolution, up.nv, key,
                    k=up.k_interp, context=up.context)
            interp = three_nn_interpolate(
                c_feat.astype(dtype), nn_idx, weights.astype(dtype))

            skip = d_feat if d_feat is not None else d_xyz
            x = jnp.concatenate([interp, skip.astype(dtype)], axis=-1)
            for li, w in enumerate(up.mlp):
                x = nn.Dense(w, dtype=dtype, name=f"up{i}_dense{li}")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=cfg.bn_momentum, dtype=dtype,
                                 name=f"up{i}_bn{li}")(x)
                x = nn.relu(x)
            x = jnp.where(d_mask[..., None], x, 0.0)
            c_xyz, c_feat, c_mask = d_xyz, x, d_mask

        # ---- per-point head ----
        x = c_feat
        for hi, w in enumerate(cfg.head):
            x = nn.Dense(w, dtype=dtype, name=f"head_dense{hi}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=cfg.bn_momentum, dtype=dtype,
                             name=f"head_bn{hi}")(x)
            x = nn.relu(x)
            if cfg.dropout > 0:
                x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        logits = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                          name="logits")(x)
        return logits

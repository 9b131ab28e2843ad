"""F-10: GridGCN segmentation network (S3DIS / ScanNet), SURVEY.md §2.2, §3.4.

PointNet++-style encoder–decoder built from GridConv stages:
  encoder: cfg.layers GridConv downsampling stages (levels cached for skips)
  decoder: per stage — F-05 grid 3-NN query (gridify_up equivalent) +
           inverse-distance interpolation + skip-concat + shared MLP
  head:    per-point MLP → class logits.

Whole-scene inference (BASELINE config 5, the headline throughput benchmark)
is this same module applied at 80K+ points with batch sharded across chips
(gridgcn_tpu.parallel).

The module is setup-based (not @nn.compact) so its pieces — `encode_layer`,
`decode_stage`, `head_logits` — can be driven individually via
`model.apply(..., method=...)`. The fully-resident spatially-sharded forward
(gridgcn_tpu.parallel.resident, F-22) composes them per shard under
shard_map; parameter names are identical to the monolithic network, so the
same checkpoints serve both paths.
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

    def setup(self):
        cfg = self.cfg
        if len(cfg.up_layers) != len(cfg.layers):
            raise ValueError("seg model needs one up_layer per encoder layer")
        dtype = jnp.dtype(cfg.dtype)
        conv_cls = nn.remat(GridConv, static_argnums=(4,)) if cfg.remat \
            else GridConv
        adt = jnp.dtype(cfg.att_dtype) if cfg.att_dtype else None
        bdt = jnp.dtype(cfg.bn_dtype) if cfg.bn_dtype else dtype
        self._convs = [
            conv_cls(spec, dtype=dtype, bn_momentum=cfg.bn_momentum,
                     fold_bn=cfg.fold_bn, att_dtype=adt,
                     bn_dtype=(None if cfg.bn_dtype == "" else bdt),
                     feat_has_xyz_prefix=(i == 0 and cfg.use_xyz_feature),
                     name=f"gridconv{i}")
            for i, spec in enumerate(cfg.layers)]
        self._up_dense = [
            [nn.Dense(w, dtype=dtype, name=f"up{i}_dense{li}")
             for li, w in enumerate(up.mlp)]
            for i, up in enumerate(cfg.up_layers)]
        self._up_bn = [
            [nn.BatchNorm(momentum=cfg.bn_momentum, dtype=bdt,
                          name=f"up{i}_bn{li}")
             for li in range(len(up.mlp))]
            for i, up in enumerate(cfg.up_layers)]
        self._head_dense = [
            nn.Dense(w, dtype=dtype, name=f"head_dense{hi}")
            for hi, w in enumerate(cfg.head)]
        self._head_bn = [
            nn.BatchNorm(momentum=cfg.bn_momentum, dtype=bdt,
                         name=f"head_bn{hi}")
            for hi in range(len(cfg.head))]
        self._dropout = nn.Dropout(cfg.dropout)
        self._logits = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                                name="logits")

    # ---- pieces (individually drivable via apply(method=...)) ----

    def encode_layer(self, i: int, xyz, feat, mask, train: bool = False,
                     bounds=None):
        """GridConv stage i: one CAGQ + GCA downsampling step."""
        return self._convs[i](xyz, feat, mask, train, bounds)

    def decode_stage(self, i: int, c_xyz, c_feat, c_mask,
                     d_xyz, d_feat, d_mask, train: bool = False):
        """Feature-propagation stage i: 3-NN interp from the coarse level
        (c_*) to the dense level (d_*), skip-concat, shared MLP."""
        cfg = self.cfg
        up = cfg.up_layers[i]
        dtype = jnp.dtype(cfg.dtype)
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
        # interp_dtype: the inverse-distance weighted sum can accumulate at
        # higher precision than the up-MLPs (selective mixed precision);
        # the result rejoins the MLP path at the compute dtype either way
        idt = jnp.dtype(cfg.interp_dtype) if cfg.interp_dtype else dtype
        interp = three_nn_interpolate(
            c_feat.astype(idt), nn_idx, weights.astype(idt)).astype(dtype)

        skip = d_feat if d_feat is not None else d_xyz
        x = jnp.concatenate([interp, skip.astype(dtype)], axis=-1)
        for dense, bn in zip(self._up_dense[i], self._up_bn[i]):
            x = dense(x)
            if not cfg.fold_bn:
                x = bn(x, use_running_average=not train)
            x = nn.relu(x)
        return jnp.where(d_mask[..., None], x, 0.0)

    def head_logits(self, x, train: bool = False):
        """Per-point classification head."""
        for dense, bn in zip(self._head_dense, self._head_bn):
            x = dense(x)
            if not self.cfg.fold_bn:
                x = bn(x, use_running_average=not train)
            x = nn.relu(x)
            if self.cfg.dropout > 0:
                x = self._dropout(x, deterministic=not train)
        return self._logits(x)

    # ---- full network ----

    def __call__(self, xyz: jax.Array, feat: Optional[jax.Array],
                 mask: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        if cfg.use_xyz_feature:
            # absolute position as an input feature (PointNet++ convention)
            feat = xyz if feat is None else jnp.concatenate([xyz, feat], -1)

        levels = [(xyz, feat, mask)]
        for i in range(len(cfg.layers)):
            xyz, feat, mask = self.encode_layer(i, xyz, feat, mask, train)
            levels.append((xyz, feat, mask))

        c_xyz, c_feat, c_mask = levels[-1]
        for i in range(len(cfg.up_layers)):
            d_xyz, d_feat, d_mask = levels[-2 - i]
            c_feat = self.decode_stage(i, c_xyz, c_feat, c_mask,
                                       d_xyz, d_feat, d_mask, train)
            c_xyz, c_mask = d_xyz, d_mask

        return self.head_logits(c_feat, train)

"""F-09: GridGCN classification network for ModelNet40 (SURVEY.md §2.2).

Reference shape (paper §4.3, BASELINE config 1/2): a stack of GridConv
downsampling layers (progressively fewer centers) → global masked max-pool →
FC head (512→256→num_classes with BN + dropout) → logits. All layer sizes are
config (presets `modelnet40_full` / `modelnet40_cas` / `modelnet40_compact`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gridgcn_tpu.configs.base import ModelConfig
from gridgcn_tpu.models.gridconv import GridConv

_NEG_INF = -1e30


class GridGCNClassifier(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xyz: jax.Array, feat: Optional[jax.Array],
                 mask: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)

        if cfg.use_xyz_feature:
            # absolute position as an input feature (PointNet++ convention);
            # relative geometry is always present via GCA's Δp encoding
            feat = xyz if feat is None else jnp.concatenate([xyz, feat], -1)

        conv_cls = nn.remat(GridConv, static_argnums=(4,)) if cfg.remat \
            else GridConv
        adt = jnp.dtype(cfg.att_dtype) if cfg.att_dtype else None
        bdt = jnp.dtype(cfg.bn_dtype) if cfg.bn_dtype else dtype
        for i, spec in enumerate(cfg.layers):
            xyz, feat, mask = conv_cls(
                spec, dtype=dtype, bn_momentum=cfg.bn_momentum,
                fold_bn=cfg.fold_bn, att_dtype=adt,
                bn_dtype=(None if cfg.bn_dtype == "" else bdt),
                feat_has_xyz_prefix=(i == 0 and cfg.use_xyz_feature),
                name=f"gridconv{i}")(xyz, feat, mask, train)

        # global masked max-pool over the last level's centers
        x = jnp.max(jnp.where(mask[..., None], feat, _NEG_INF), axis=-2)
        x = jnp.where(jnp.any(mask, axis=-1, keepdims=True), x, 0.0)

        for hi, w in enumerate(cfg.head):
            x = nn.Dense(w, dtype=dtype, name=f"head_dense{hi}")(x)
            if not cfg.fold_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=cfg.bn_momentum, dtype=bdt,
                                 name=f"head_bn{hi}")(x)
            x = nn.relu(x)
            if cfg.dropout > 0:
                x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        logits = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                          name="logits")(x)
        return logits

"""F-07: Grid Context Aggregation module (SURVEY.md §2.2, §3.3; paper §3.2).

Dense, static-shape flax implementation of the reference's GCA: for every
(center i, node j) pair
    edge feature   f̃_ij = MLP_e([f_j ; Δp_ij ; |Δp_ij|])
    attention      e_ij = MLP_a([geo_ij ; coverage_j ; ctx_i])
    output         out_i = MLP_post( pool_j ( mask ⊙ e_ij · f̃_ij ) )
where coverage_j is the raw-point count of node j's voxel (computed by F-04)
and ctx_i is the grid-context pooling summary — a cheap masked pool over the
group's node features, reusing indices the gather already produced.

Everything is [B, M, K, C] matmul work that XLA fuses and tiles onto the MXU;
the 1×1-conv-as-Dense exactly mirrors the reference's shared-MLP trick on the
framework-op layer (SURVEY §1 L1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gridgcn_tpu.configs.base import GridLayerSpec

_NEG_INF = -1e30


class GCA(nn.Module):
    spec: GridLayerSpec
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9
    # inference-only: BN already folded into the Dense weights (models.fold)
    fold_bn: bool = False
    # selective mixed precision (ModelConfig.att_dtype): dtype of the
    # attention path — geometry, coverage norm, context summary, attention
    # MLP + softmax. None = follow `dtype` (the single-dtype path, bit-
    # identical to the pre-knob module).
    att_dtype: jnp.dtype = None
    # selective mixed precision (ModelConfig.bn_dtype): BatchNorm compute
    # dtype. None = follow `dtype`.
    bn_dtype: jnp.dtype = None

    def _mlp(self, x, widths, mask, train: bool, name: str):
        bdt = self.dtype if self.bn_dtype is None else self.bn_dtype
        for li, w in enumerate(widths):
            x = nn.Dense(w, dtype=self.dtype, name=f"{name}_dense{li}")(x)
            if not self.fold_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=self.bn_momentum, dtype=bdt,
                                 name=f"{name}_bn{li}")(x)
            x = nn.relu(x)
            x = jnp.where(mask[..., None], x, 0.0)
        return x

    @nn.compact
    def __call__(self, node_feat: Optional[jax.Array], delta_p: jax.Array,
                 mask: jax.Array, coverage: jax.Array, train: bool = False,
                 ctx_feat: Optional[jax.Array] = None):
        """node_feat [B,M,K,C] or None, delta_p [B,M,K,3], mask [B,M,K],
        coverage [B,M,K] int → [B, M, mlp[-1]] center features.

        ctx_feat [B, M, Cc] (optional): pre-pooled summary over ALL stored
        context points (the paper's Fig. 3 grid-context pooling source,
        spec.context_pool_source='candidates'); when absent the summary is
        pooled over the K selected nodes."""
        spec = self.spec
        adt = self.dtype if self.att_dtype is None else self.att_dtype
        # geometry is computed at the attention-path dtype; when adt ==
        # dtype this is exactly the single-dtype path (cast before norm)
        delta_p = delta_p.astype(adt)
        dist = jnp.linalg.norm(delta_p + 1e-12, axis=-1, keepdims=True)
        geo = jnp.concatenate([delta_p, dist], axis=-1)          # [B,M,K,4]
        geo = jnp.where(mask[..., None], geo, 0.0)

        geo_e = geo.astype(self.dtype)
        parts = [geo_e] if node_feat is None else [
            jnp.where(mask[..., None], node_feat.astype(self.dtype), 0.0),
            geo_e]
        edge_in = jnp.concatenate(parts, axis=-1)

        edge = self._mlp(edge_in, spec.mlp, mask, train, "edge")  # [B,M,K,Co]

        # --- attention inputs ---
        att_parts = [geo]
        if spec.use_coverage:
            cov = coverage.astype(adt)
            cov_sum = jnp.sum(jnp.where(mask, cov, 0.0), axis=-1, keepdims=True)
            cov_norm = cov / jnp.maximum(cov_sum, 1.0)
            att_parts.append(jnp.where(mask, cov_norm, 0.0)[..., None])
            att_parts.append(jnp.where(mask, jnp.log1p(cov), 0.0)[..., None])
        if spec.use_context_pool:
            # Grid-context pooling (F-07): summary over context points —
            # indices already exist, so this costs one reduction. Source is
            # either ALL stored context points (ctx_feat, paper-faithful) or
            # the K selected nodes (cheap default).
            if ctx_feat is not None:
                ctx = ctx_feat.astype(adt)
            else:
                denom = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
                src = edge_in.astype(adt)
                ctx = jnp.sum(src * mask[..., None], axis=-2) / denom
            ctx = nn.Dense(spec.context_channels, dtype=adt,
                           name="ctx_dense")(ctx)
            ctx = nn.relu(ctx)                                    # [B,M,Cctx]
            att_parts.append(jnp.broadcast_to(
                ctx[:, :, None, :], (*mask.shape, spec.context_channels)))
        att_in = jnp.concatenate(att_parts, axis=-1)

        a = nn.Dense(spec.att_hidden, dtype=adt, name="att_dense0")(att_in)
        a = nn.relu(a)
        a = nn.Dense(1, dtype=adt, name="att_dense1")(a)[..., 0]  # [B,M,K]
        if spec.att_activation == "softmax":
            a = jnp.where(mask, a, _NEG_INF)
            att = jax.nn.softmax(a, axis=-1)
            # scale so an all-uniform attention is the identity wrt max-pool
            att = att * jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
        elif spec.att_activation == "sigmoid":
            att = jax.nn.sigmoid(a) * 2.0
        else:
            raise ValueError(f"unknown att_activation: {spec.att_activation}")
        # attention weights rejoin the edge path at the edge dtype (a noop
        # on the single-dtype path) — the softmax itself ran at adt
        att = jnp.where(mask, att, 0.0).astype(self.dtype)

        weighted = edge * att[..., None]                          # [B,M,K,Co]

        pooled = jnp.max(
            jnp.where(mask[..., None], weighted, _NEG_INF), axis=-2)
        group_valid = jnp.any(mask, axis=-1)
        pooled = jnp.where(group_valid[..., None], pooled, 0.0)
        if spec.pool == "maxsum":
            denom = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
            mean = jnp.sum(weighted * mask[..., None], axis=-2) / denom
            pooled = jnp.concatenate([pooled, mean], axis=-1)
            pooled = nn.Dense(spec.mlp[-1], dtype=self.dtype,
                              name="pool_proj")(pooled)
        elif spec.pool != "max":
            raise ValueError(f"unknown pool: {spec.pool}")
        return pooled

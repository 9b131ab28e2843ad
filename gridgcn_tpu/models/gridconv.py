"""F-08: GridConv block = CAGQ ∘ GCA — the network's only structural
primitive (SURVEY.md §2.2, paper §3).

CAGQ (pure index computation, no gradients) runs first; its indices drive
dense XLA gathers of node positions/features, and GCA does the matmul work.
PRNG for the sampling randomness is threaded through flax's rng mechanism
under the name 'cagq' so a fixed rng tree gives bitwise-identical index
tensors (SURVEY §7 H6).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gridgcn_tpu.configs.base import GridLayerSpec
from gridgcn_tpu.models.gca import GCA
from gridgcn_tpu.ops.cagq import cagq


def gather_point_features(feat: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched take: feat [B, N, C], idx [B, M, K] → [B, M, K, C]."""
    return jax.vmap(lambda f, i: f[i])(feat, idx)


class GridConv(nn.Module):
    spec: GridLayerSpec
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9
    # inference-only: BN already folded into the Dense weights (models.fold)
    fold_bn: bool = False
    # selective mixed precision: attention-path / BatchNorm dtypes
    # (ModelConfig.att_dtype / bn_dtype; None = follow dtype)
    att_dtype: jnp.dtype = None
    bn_dtype: jnp.dtype = None
    # Set by the parent network on the INPUT layer when use_xyz_feature put
    # raw xyz in feat[..., :3]: those channels are then read from the
    # already-gathered g.node_xyz instead of a second [M·K]-row gather over
    # feat (the gather was ~1.1 ms/scene at whole-scene scale — the single
    # hottest op in the profile). Output-identical: GCA masks node_feat.
    feat_has_xyz_prefix: bool = False

    @nn.compact
    def __call__(self, xyz: jax.Array, feat: Optional[jax.Array],
                 mask: jax.Array, train: bool = False, bounds=None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One downsampling stage.

        Args:
          xyz:  [B, N, 3] level point positions.
          feat: [B, N, C] level point features, or None at the input level.
          mask: [B, N] validity.
          bounds: optional explicit (origin [B,3], vsize [B,3]) grid bounds
            (spatial sharding aligns every shard on the global grid, F-22).
        Returns:
          (center_xyz [B, M, 3], center_feat [B, M, Co], center_valid [B, M])
        """
        key = self.make_rng("cagq")
        out = cagq(xyz, mask, self.spec, key, bounds=bounds)
        g = out.groups

        if feat is None:
            node_feat = None
            node_xyz = g.node_xyz
        elif self.feat_has_xyz_prefix:
            node_xyz = g.node_xyz
            nxyz = node_xyz.astype(feat.dtype)
            if feat.shape[-1] > 3:
                rest = gather_point_features(feat[..., 3:], g.neighbor_idx)
                node_feat = jnp.concatenate([nxyz, rest], axis=-1)
            else:
                node_feat = nxyz
        else:
            # ONE [B·M·K]-row gather for coords AND features: xyz columns
            # ride in front of feat, so g.node_xyz (a second gather of the
            # same rows inside ops/gather) goes unused and XLA DCEs it —
            # gather cost is row-rate-bound, so halving the row sets saves
            # ~0.7 ms/step on scannet_seg. bf16 feat: xyz rides as its
            # exact bitcast bf16 pairs (no precision loss on positions).
            if feat.dtype.itemsize == 2:   # bf16/f16: exact bitcast pairs
                xyz_cols = jax.lax.bitcast_convert_type(
                    xyz.astype(jnp.float32), feat.dtype
                ).reshape(*xyz.shape[:-1], 6)
                got = gather_point_features(
                    jnp.concatenate([xyz_cols, feat], axis=-1),
                    g.neighbor_idx)
                node_xyz = jax.lax.bitcast_convert_type(
                    got[..., :6].reshape(*got.shape[:-1], 3, 2), jnp.float32)
                node_feat = got[..., 6:]
            elif feat.dtype == jnp.float32:
                got = gather_point_features(
                    jnp.concatenate([xyz.astype(feat.dtype), feat], axis=-1),
                    g.neighbor_idx)
                node_xyz = got[..., :3]
                node_feat = got[..., 3:]
            else:   # exotic dtype: two gathers, but never quantize positions
                node_xyz = g.node_xyz
                node_feat = gather_point_features(feat, g.neighbor_idx)
            node_xyz = jnp.where(g.neighbor_mask[..., None], node_xyz, 0.0)

        delta_p = node_xyz - g.center_xyz[:, :, None, :]
        delta_p = jnp.where(g.neighbor_mask[..., None], delta_p, 0.0)

        # paper-faithful grid-context pooling source: masked mean over ALL
        # stored context points (spec.context_pool_source='candidates')
        ctx_feat = None
        if g.cand_idx is not None and feat is not None:
            cand_feat = gather_point_features(feat, g.cand_idx)
            w = g.cand_valid[..., None].astype(cand_feat.dtype)
            denom = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
            ctx_feat = jnp.sum(cand_feat * w, axis=-2) / denom

        center_feat = GCA(self.spec, dtype=self.dtype,
                          bn_momentum=self.bn_momentum,
                          fold_bn=self.fold_bn, att_dtype=self.att_dtype,
                          bn_dtype=self.bn_dtype, name="gca")(
            node_feat, delta_p, g.neighbor_mask, g.node_coverage,
            train=train, ctx_feat=ctx_feat)
        return g.center_xyz, center_feat, g.center_valid

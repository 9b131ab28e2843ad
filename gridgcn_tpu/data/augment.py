"""F-14: point-cloud augmentation, jit-compiled on device (SURVEY.md §2.3).

The reference augments on the host inside its data iterator (rotate / jitter /
scale / dropout, the PointNet++ lineage); the north star requires the whole
preprocessing front-end to run under jit on device [BASELINE north_star], so
this module is pure jnp over static shapes and a PRNG key. It is called from
inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gridgcn_tpu.configs.base import DataConfig


def augment_batch(xyz: jax.Array, mask: jax.Array, key: jax.Array,
                  cfg: DataConfig, feat: jax.Array | None = None):
    """Random rotation (up axis) + anisotropic-free scale + shift + jitter +
    point dropout. xyz [B, N, 3], mask [B, N], feat [B, N, C] or None →
    (xyz, mask, feat).

    Geometric feature columns (cfg.feat_geo_channels — e.g. s3dis
    normalized room xyz) rotate WITH the cloud, exactly like the voting
    eval protocol (train/steps.make_voting_eval_step): rotating positions
    while leaving xyz-derived features stale feeds the model geometrically
    inconsistent pairs on every rotated batch."""
    if not cfg.augment:
        return xyz, mask, feat
    B, N = xyz.shape[:2]
    k_rot, k_scale, k_shift, k_jit, k_drop, k_dropn = jax.random.split(key, 6)

    if cfg.rotate:
        theta = jax.random.uniform(k_rot, (B,), minval=0.0,
                                   maxval=2.0 * jnp.pi)
        c, s = jnp.cos(theta), jnp.sin(theta)
        zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
        # rotation about the up (y) axis, PointNet++ convention
        rot = jnp.stack([
            jnp.stack([c, zeros, s], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([-s, zeros, c], -1),
        ], -2)                                               # [B, 3, 3]
        xyz = jnp.einsum("bnj,bjk->bnk", xyz, rot)
        geo = tuple(cfg.feat_geo_channels)
        if feat is not None and geo:
            assert len(geo) == 3, "feat_geo_channels must name 3 columns"
            gidx = jnp.asarray(geo)
            rotated = jnp.einsum(
                "bnj,bjk->bnk", feat[..., gidx].astype(xyz.dtype), rot)
            feat = feat.at[..., gidx].set(rotated.astype(feat.dtype))

    if cfg.scale_high > cfg.scale_low:
        scale = jax.random.uniform(k_scale, (B, 1, 1), minval=cfg.scale_low,
                                   maxval=cfg.scale_high)
        xyz = xyz * scale

    if cfg.shift_range > 0:
        shift = jax.random.uniform(k_shift, (B, 1, 3),
                                   minval=-cfg.shift_range,
                                   maxval=cfg.shift_range)
        xyz = xyz + shift

    if cfg.jitter_sigma > 0:
        noise = jnp.clip(
            cfg.jitter_sigma * jax.random.normal(k_jit, xyz.shape),
            -cfg.jitter_clip, cfg.jitter_clip)
        xyz = xyz + noise

    if cfg.dropout_max > 0:
        # random point dropout: per-cloud ratio in [0, dropout_max); dropped
        # points are masked out (static shapes — mask carries the drop).
        ratio = jax.random.uniform(k_drop, (B, 1), maxval=cfg.dropout_max)
        u = jax.random.uniform(k_dropn, (B, N))
        mask = mask & (u >= ratio)

    return xyz, mask, feat

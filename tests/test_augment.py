"""F-14 on-device augmentation properties."""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.configs.base import DataConfig
from gridgcn_tpu.data.augment import augment_batch


def _cloud(key, B=4, N=128):
    return (jax.random.uniform(key, (B, N, 3), minval=-1, maxval=1),
            jnp.ones((B, N), bool))


def test_deterministic_given_key(rng_key):
    xyz, mask = _cloud(rng_key)
    cfg = DataConfig(augment=True, dropout_max=0.2)
    a1, m1, _ = augment_batch(xyz, mask, rng_key, cfg)
    a2, m2, _ = augment_batch(xyz, mask, rng_key, cfg)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_rotation_preserves_y_and_norm(rng_key):
    xyz, mask = _cloud(rng_key)
    cfg = DataConfig(augment=True, rotate=True, jitter_sigma=0.0,
                     scale_low=1.0, scale_high=1.0, shift_range=0.0)
    out, _, _ = augment_batch(xyz, mask, rng_key, cfg)
    # rotation about up (y) axis: y coordinates and xz-radii unchanged
    np.testing.assert_allclose(np.asarray(out[..., 1]),
                               np.asarray(xyz[..., 1]), atol=1e-6)
    r_in = np.linalg.norm(np.asarray(xyz[..., [0, 2]]), axis=-1)
    r_out = np.linalg.norm(np.asarray(out[..., [0, 2]]), axis=-1)
    np.testing.assert_allclose(r_out, r_in, atol=1e-5)


def test_augment_off_is_identity(rng_key):
    xyz, mask = _cloud(rng_key)
    cfg = DataConfig(augment=False)
    out, m, _ = augment_batch(xyz, mask, rng_key, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(xyz))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mask))


def test_dropout_masks_points(rng_key):
    xyz, mask = _cloud(rng_key)
    cfg = DataConfig(augment=True, rotate=False, jitter_sigma=0.0,
                     scale_low=1.0, scale_high=1.0, shift_range=0.0,
                     dropout_max=0.5)
    _, m, _ = augment_batch(xyz, mask, rng_key, cfg)
    assert int(jnp.sum(m)) < int(jnp.sum(mask))
    # jit-compatible (the whole point: runs inside the train step)
    jitted = jax.jit(lambda x, mk, k: augment_batch(x, mk, k, cfg))
    _ = jitted(xyz, mask, rng_key)


def test_geo_feature_channels_rotate_with_cloud(rng_key):
    # s3dis-style feat: [rgb(0:3) | normalized-xyz(3:6)]; rotating the
    # cloud must rotate the geo columns by the SAME matrix and leave the
    # others untouched (mirrors make_voting_eval_step; ADVICE r1 #1)
    xyz, mask = _cloud(rng_key)
    feat = jnp.concatenate([jax.random.uniform(rng_key, xyz.shape), xyz], -1)
    cfg = DataConfig(augment=True, rotate=True, jitter_sigma=0.0,
                     scale_low=1.0, scale_high=1.0, shift_range=0.0,
                     feat_geo_channels=(3, 4, 5))
    out_xyz, _, out_feat = augment_batch(xyz, mask, rng_key, cfg, feat=feat)
    # geo columns started == xyz, so after the shared rotation they must
    # still equal the rotated xyz exactly
    np.testing.assert_allclose(np.asarray(out_feat[..., 3:6]),
                               np.asarray(out_xyz), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_feat[..., :3]),
                                  np.asarray(feat[..., :3]))

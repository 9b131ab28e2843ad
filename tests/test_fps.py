"""FPS + ball-query baselines (comparison ops for the CAGQ speedup claim)."""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.ops.fps import ball_query, farthest_point_sampling


def test_fps_distinct_valid_and_spread(rng_key):
    B, N, M = 2, 300, 32
    xyz = jax.random.uniform(rng_key, (B, N, 3))
    mask = jnp.ones((B, N), bool).at[:, 280:].set(False)
    idx = np.asarray(farthest_point_sampling(xyz, mask, M, rng_key))
    for b in range(B):
        assert len(set(idx[b].tolist())) == M          # distinct
        assert (idx[b] < 280).all()                     # valid only
    # FPS spread beats random sampling spread (min pairwise distance)
    def min_pairwise(pts):
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()
    xyz_np = np.asarray(xyz)
    rnd = np.random.default_rng(0).choice(280, M, replace=False)
    assert min_pairwise(xyz_np[0][idx[0]]) > min_pairwise(xyz_np[0][rnd])


def test_ball_query_correctness(rng_key):
    B, N, M, K, radius = 1, 500, 16, 8, 0.25
    xyz = jax.random.uniform(rng_key, (B, N, 3))
    mask = jnp.ones((B, N), bool).at[:, 450:].set(False)
    centers = jax.random.uniform(jax.random.PRNGKey(5), (B, M, 3))
    idx, valid = ball_query(xyz, mask, centers, radius, K, block=128)
    idx, valid = np.asarray(idx), np.asarray(valid)
    xyz_np, c_np = np.asarray(xyz[0]), np.asarray(centers[0])
    for m in range(M):
        d = np.linalg.norm(xyz_np[:450] - c_np[m], axis=-1)
        in_ball = np.nonzero(d <= radius)[0]
        got = idx[0, m][valid[0, m]]
        assert len(got) == min(K, len(in_ball))
        assert set(got.tolist()) <= set(in_ball.tolist())
        assert len(set(got.tolist())) == len(got)       # no duplicates

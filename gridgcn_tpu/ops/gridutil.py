"""Shared voxel-grid index arithmetic for CAGQ kernels (F-01..F-05)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def vid_to_coords(vid: jax.Array, resolution: int):
    """Linear voxel id → (x, y, z) integer grid coordinates."""
    z = vid % resolution
    y = (vid // resolution) % resolution
    x = vid // (resolution * resolution)
    return x, y, z


def context_offsets(context: int) -> np.ndarray:
    """Static [context³, 3] array of context-neighborhood offsets π(v).

    `context` is the neighborhood edge length (3 → the 3×3×3 block centered on
    the voxel, matching the reference's context walk, SURVEY §3.2 kernel C).
    """
    r = np.arange(context) - (context - 1) // 2
    return np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)


def context_neighbors(vid: jax.Array, resolution: int, context: int):
    """Voxel ids of the context neighborhood π(v) for each input voxel.

    Args:
      vid: [...] linear voxel ids (may include the sentinel V for invalid).
    Returns:
      nvid: [..., context³] neighbor linear ids (clipped; see inb for validity)
      inb:  [..., context³] bool — neighbor lies inside the grid AND the
            query voxel itself was valid.
    """
    V = resolution ** 3
    offs = jnp.asarray(context_offsets(context), jnp.int32)  # [P, 3]
    x, y, z = vid_to_coords(jnp.minimum(vid, V - 1), resolution)
    nx = x[..., None] + offs[:, 0]
    ny = y[..., None] + offs[:, 1]
    nz = z[..., None] + offs[:, 2]
    inb = ((nx >= 0) & (nx < resolution) & (ny >= 0) & (ny < resolution)
           & (nz >= 0) & (nz < resolution) & (vid[..., None] < V))
    nvid = (jnp.clip(nx, 0, resolution - 1) * resolution
            + jnp.clip(ny, 0, resolution - 1)) * resolution \
        + jnp.clip(nz, 0, resolution - 1)
    return nvid, inb

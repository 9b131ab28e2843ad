"""Pallas TPU kernel: streaming exact k-NN ("flash-kNN").

The decoder's 3-NN interpolation (F-05/F-10) reduces to: for each query
point, the k nearest support points. The XLA path (ops/upsample.dense_three_nn)
streams support blocks through a lax.scan with a carried top-k; this kernel is
the fused Pallas version in the style of flash attention: the [Nq, Ns]
distance matrix is never materialized — each grid step holds one query tile
in VMEM, sweeps all support blocks with VPU broadcast arithmetic, and keeps a
running top-k in a VMEM scratch accumulator.

Layouts (pallas_guide.md tiling rules):
  * queries arrive as one [QT, 128] tile per grid step (coords in cols 0..2,
    rest zero-padded) — sublane-aligned;
  * support is pre-transposed to [8, Ns_pad] (rows 0..2 = x,y,z, row 3 =
    valid mask, rows 4..7 padding) so a support block is a [8, SB] tile and
    per-axis broadcasts are lane-parallel;
  * top-k via k iterative masked argmins (k = 3 ≪ SB, cheaper than sorting).

Exactness matches brute force bit-for-bit on distances (fp32 all the way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _knn_kernel(q_ref, s_ref, out_d_ref, out_i_ref, *, k: int, sb: int):
    """One query tile [QT, 128] vs all support blocks [8, Ns_pad]."""
    qt = q_ref.shape[0]
    ns_pad = s_ref.shape[1]
    n_blocks = ns_pad // sb

    qx = q_ref[:, 0:1]                        # [QT, 1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]

    def block_body(b, carry):
        best_d, best_i = carry                # [QT, k] each
        off = b * sb
        sx = s_ref[0:1, pl.ds(off, sb)]       # [1, SB]
        sy = s_ref[1:2, pl.ds(off, sb)]
        sz = s_ref[2:3, pl.ds(off, sb)]
        sm = s_ref[3:4, pl.ds(off, sb)]       # 1.0 valid / 0.0 pad
        dx = qx - sx                          # [QT, SB]
        dy = qy - sy
        dz = qz - sz
        d2 = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(sm > 0.5, d2, _BIG)

        col = jax.lax.broadcasted_iota(jnp.int32, (qt, sb), 1) + off

        # fold the block's k best into the running top-k, one argmin at a time
        def fold(j, c):
            bd, bi, dcur = c
            m = jnp.min(dcur, axis=-1, keepdims=True)          # [QT, 1]
            am = jnp.argmin(dcur, axis=-1)                     # [QT]
            gidx = off + am                                    # [QT]
            # knock the winner out of the block
            hit = col == gidx[:, None]
            dnext = jnp.where(hit, _BIG, dcur)
            # insert (m, gidx) into (bd, bi): replace current worst if better
            worst = jnp.max(bd, axis=-1, keepdims=True)
            wpos = jnp.argmax(bd, axis=-1)                     # [QT]
            take = (m < worst)[:, 0]                           # [QT]
            kcol = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)
            at_w = kcol == wpos[:, None]
            bd = jnp.where(at_w & take[:, None], m, bd)
            bi = jnp.where(at_w & take[:, None], gidx[:, None], bi)
            return bd, bi, dnext

        best_d, best_i, _ = jax.lax.fori_loop(
            0, k, fold, (best_d, best_i, d2))
        return best_d, best_i

    init_d = jnp.full((qt, k), _BIG, jnp.float32)
    init_i = jnp.zeros((qt, k), jnp.int32)
    best_d, best_i = jax.lax.fori_loop(0, n_blocks, block_body,
                                       (init_d, init_i))
    # sort the k winners ascending (k tiny: selection passes)
    def order(j, c):
        bd, bi, od, oi = c
        m = jnp.min(bd, axis=-1, keepdims=True)
        am = jnp.argmin(bd, axis=-1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
        sel = kcol == am[:, None]
        gi = jnp.sum(jnp.where(sel, bi, 0), axis=-1, keepdims=True)
        ocol = jax.lax.broadcasted_iota(jnp.int32, od.shape, 1)
        od = jnp.where(ocol == j, m, od)
        oi = jnp.where(ocol == j, gi, oi)
        bd = jnp.where(sel, _BIG, bd)
        return bd, bi, od, oi

    od = jnp.zeros((qt, k), jnp.float32)
    oi = jnp.zeros((qt, k), jnp.int32)
    _, _, od, oi = jax.lax.fori_loop(0, k, order, (best_d, best_i, od, oi))
    out_d_ref[:, :k] = od
    out_i_ref[:, :k] = oi


def flash_knn(q_xyz: jax.Array, q_mask: jax.Array, s_xyz: jax.Array,
              s_mask: jax.Array, k: int = 3, qt: int = 256, sb: int = 512,
              interpret: bool = False):
    """Exact k-NN distances/indices for one cloud pair.

    q_xyz [Nq, 3], s_xyz [Ns, 3] → (d2 [Nq, k], idx [Nq, k], valid [Nq, k]).
    """
    Nq, Ns = q_xyz.shape[0], s_xyz.shape[0]
    qt = min(qt, max(8, Nq))
    nq_pad = -(-Nq // qt) * qt
    sb = min(sb, max(128, Ns))
    ns_pad = -(-Ns // sb) * sb

    q = jnp.zeros((nq_pad, 128), jnp.float32)
    q = q.at[:Nq, :3].set(q_xyz.astype(jnp.float32))

    s = jnp.zeros((8, ns_pad), jnp.float32)
    s = s.at[:3, :Ns].set(s_xyz.astype(jnp.float32).T)
    s = s.at[3, :Ns].set(s_mask.astype(jnp.float32))

    # top-k outputs padded to lane width
    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, sb=sb),
        grid=(nq_pad // qt,),
        in_specs=[
            pl.BlockSpec((qt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ns_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, 128), jnp.int32),
        ),
        interpret=interpret,
    )(q, s)

    d2 = out_d[:Nq, :k]
    idx = out_i[:Nq, :k]
    valid = (d2 < _BIG * 0.5) & q_mask[:, None]
    return d2, idx, valid


def flash_three_nn(query_xyz: jax.Array, query_mask: jax.Array,
                   support_xyz: jax.Array, support_mask: jax.Array,
                   k: int = 3, interpret: bool = False):
    """Batched flash-kNN with inverse-distance weights — drop-in for
    ops.upsample.dense_three_nn, Pallas edition."""
    def one(qx, qm, sx, sm):
        d2, idx, valid = flash_knn(qx, qm, sx, sm, k=k, interpret=interpret)
        d2 = jnp.maximum(d2, 0.0)
        w = jnp.where(valid, 1.0 / (d2 + 1e-8), 0.0)
        w_sum = jnp.sum(w, axis=-1, keepdims=True)
        weights = jnp.where(w_sum > 0, w / jnp.maximum(w_sum, 1e-12), 0.0)
        return jnp.where(valid, idx, 0), weights, jnp.any(valid, axis=-1)

    return jax.vmap(one)(query_xyz, query_mask, support_xyz, support_mask)

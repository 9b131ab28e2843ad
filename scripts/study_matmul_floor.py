"""Round-3 study: is the §11 'GCA/decoder matmuls ~2.4 ms, floor ~1.1' row
actually recoverable, or is XLA already at the practical floor for these
shapes?

Protocol (design.md §7): three measurements on the real chip —
  1. SHAPES: record every nn.Dense application (rows, c_in, c_out) in the
     whole-scene forward via an abstract eval_shape trace (zero compute).
  2. STANDALONE: time each recorded matmul shape as an isolated jitted
     dot chain (bf16, 40 iters, pipelined launches / one scalar fetch —
     the bench protocol) and compare the sum against the in-model trace
     attribution. If standalone ~= attribution, the row is at XLA's floor
     for these shapes and only a model change (wider channels) moves it.
  3. FUSION CANDIDATES: at the real shapes, time
       (a) pad-contraction: [r, c]x[c, o] vs [r, 128]x[128, o] — if equal,
           independent matmuls with c<=64 can share one 128-deep pass via
           block-diagonal weights (halves weight-load passes);
       (b) edge0+att0 combined: one [r, c_e + c_a] x [c_e + c_a, 64+16]
           matmul with structural zeros vs the two separate matmuls.

Usage: python scripts/study_matmul_floor.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gridgcn_tpu.configs import presets
from gridgcn_tpu.models.build import build_model, init_model, example_inputs

ITERS = 40


def record_dense_shapes(cfg):
    """Abstract-trace the forward; record each Dense (rows, c_in, c_out)."""
    shapes = []
    orig = nn.Dense.__call__

    def spy(self, x):
        rows = int(np.prod(x.shape[:-1]))
        shapes.append((self.name or "dense", rows, int(x.shape[-1]),
                       int(self.features)))
        return orig(self, x)

    nn.Dense.__call__ = spy
    try:
        model, variables = init_model(cfg)
        xyz, feat, mask = example_inputs(cfg, batch_size=cfg.data.batch_size)
        shapes.clear()   # drop shapes recorded during init
        jax.eval_shape(
            functools.partial(model.apply, train=False,
                              rngs={"cagq": jax.random.PRNGKey(0)}),
            variables, xyz, feat, mask)
    finally:
        nn.Dense.__call__ = orig
    return shapes


def time_fn(fn, *args, iters=ITERS):
    # block_until_ready is a no-op through the axon tunnel (design.md §7):
    # only a scalar fetch actually syncs, so warm up with one.
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    # one scalar fetch syncs the tunnel (design.md §7)
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    _ = float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = presets.get("scannet_whole_scene")
    shapes = record_dense_shapes(cfg)
    print(f"recorded {len(shapes)} Dense applications")
    total_flops = 0.0
    for name, r, ci, co in shapes:
        total_flops += 2.0 * r * ci * co
        print(f"  {name:14s} [{r:7d}, {ci:4d}] x [{ci:4d}, {co:4d}]"
              f"  {2.0*r*ci*co/1e9:7.3f} GFLOP")
    print(f"TOTAL matmul FLOPs: {total_flops/1e9:.2f} G"
          f" -> {total_flops/197e12*1e3:.3f} ms at v5e bf16 peak")

    # --- 2. standalone timing, grouped to amortize launch overhead:
    # one jitted fn running ALL recorded matmuls back to back.
    key = jax.random.PRNGKey(0)
    mats = []
    for i, (name, r, ci, co) in enumerate(shapes):
        k1, k2, key = jax.random.split(key, 3)
        mats.append((jax.random.normal(k1, (r, ci), jnp.bfloat16),
                     jax.random.normal(k2, (ci, co), jnp.bfloat16)))

    @jax.jit
    def all_matmuls(mats):
        return [jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
                for a, b in mats]

    ms = time_fn(all_matmuls, mats)
    print(f"STANDALONE all {len(shapes)} matmuls back-to-back: {ms:.3f} ms"
          f" (MFU {total_flops/197e12*1e3/ms*100:.1f}%)")

    # --- 3a. pad-contraction probe at representative shapes
    for r, ci, co in [(262144, 68, 64), (262144, 128, 64),
                      (65536, 132, 128), (65536, 128, 128),
                      (81920, 259, 256), (81920, 384, 256)]:
        a = jax.random.normal(key, (r, ci), jnp.bfloat16)
        b = jax.random.normal(key, (ci, co), jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.bfloat16))
        print(f"  probe [{r},{ci}]x[{ci},{co}]: {time_fn(f, a, b):.3f} ms")

    # --- 3b. edge0 + att0 fusion at L0 whole-scene shapes
    # L0: edge_in [1*8192*32, 4] (geo only, in_channels=0 + use_xyz: C=3+4?)
    # use the recorded L0 shapes directly:
    edge0 = next(s for s in shapes if s[0] == "edge_dense0")
    att0 = next(s for s in shapes if s[0] == "att_dense0")
    r = edge0[1]
    ce, oe = edge0[2], edge0[3]
    ca, oa = att0[2], att0[3]
    xe = jax.random.normal(key, (r, ce), jnp.bfloat16)
    xa = jax.random.normal(key, (r, ca), jnp.bfloat16)
    we = jax.random.normal(key, (ce, oe), jnp.bfloat16)
    wa = jax.random.normal(key, (ca, oa), jnp.bfloat16)

    @jax.jit
    def separate(xe, we, xa, wa):
        return (jnp.dot(xe, we, preferred_element_type=jnp.bfloat16),
                jnp.dot(xa, wa, preferred_element_type=jnp.bfloat16))

    wc = jnp.zeros((ce + ca, oe + oa), jnp.bfloat16)
    wc = wc.at[:ce, :oe].set(we).at[ce:, oe:].set(wa)

    @jax.jit
    def combined(xe, xa, wc):
        x = jnp.concatenate([xe, xa], axis=-1)
        y = jnp.dot(x, wc, preferred_element_type=jnp.bfloat16)
        return y[:, :oe], y[:, oe:]

    print(f"  edge0+att0 separate ([{r},{ce}]x[{ce},{oe}] + [{r},{ca}]x"
          f"[{ca},{oa}]): {time_fn(separate, xe, we, xa, wa):.3f} ms")
    print(f"  edge0+att0 combined ([{r},{ce+ca}]x[{ce+ca},{oe+oa}]):"
          f" {time_fn(combined, xe, xa, wc):.3f} ms")


if __name__ == "__main__":
    main()

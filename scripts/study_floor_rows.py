"""§11 floor proofs for the three remaining rows (VERDICT r3 #5).

design.md §11 closed most of the whole-scene speed-of-light table with
measurements; three rows were closed on arguments only:

  (a) "voxel sort [81920] 0.65 ms — accepted" because radix alternatives
      *would* need ≥4 scatter passes — never timed;
  (b) "L1–L3 encoder gathers ~1.6 vs ~1.3 floor — near";
  (c) "misc VPU fusions ~1.7 — bandwidth-bound" with no byte accounting.

This script measures all three on the real chip:

  (a) times `lax.sort` at the exact L0 shape against ONE honestly-built
      radix pass (digit extract + stable rank-within-digit via one-hot
      cumsum + destination scatter). A 32-bit key needs ≥4 such passes,
      so 4×pass vs sort settles the row.
  (b) times encoder layers 1–3 chained standalone (jit'd apart from the
      rest of the network) and traces them, so the row's attribution is a
      measurement instead of a whole-trace residual.
  (c) pulls bytes-accessed from the compiled forward's cost analysis and
      compares measured busy time against bytes / HBM bandwidth — if the
      pipeline sits at the bandwidth floor, the fusion row is closed.

Usage: python scripts/study_floor_rows.py [--iters 30]
"""

import argparse
import json
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

# public v5e figure
HBM_BYTES_PER_S = 8.19e11


def _time(fn, *args, iters=30, warmup=2):
    """Bench-protocol timer: `fn` must return a SCALAR. Warmup fetches the
    scalar (the only reliable sync on the tunnel — block_until_ready can
    return before execution AND before compilation finishes); the timed
    loop pipelines `iters` dispatches and fetches only the last scalar."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def study_sort(iters: int) -> dict:
    """(a): lax.sort vs one radix pass at the L0 whole-scene shape.

    The production sort is the vmapped single-cloud build's — a [1, N]
    batched sort along the last axis (ops/voxelize.py:201 under vmap), so
    that is the form timed here. (Rank-1 [N] u32 sort measured 4 s/call
    standalone — a degenerate lowering the model never hits.)"""
    N = 81920
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**31, (1, N), dtype=np.int64)
                       .astype(np.uint32))
    payload = jnp.arange(N, dtype=jnp.int32)[None]

    @jax.jit
    def xla_sort(k, p):
        sk, sp = jax.lax.sort((k, p), num_keys=1, dimension=-1)
        return sk.astype(jnp.float32).sum() + sp.sum()

    @jax.jit
    def radix_pass(k2, p2, shift):
        """One stable 8-bit radix pass, built from what XLA/TPU offers
        (no atomics): rank-within-digit via a [N, 256] one-hot cumsum,
        digit base offsets via histogram cumsum, then ONE row scatter.
        32-bit keys need four of these."""
        k, p = k2[0], p2[0]
        digit = ((k >> shift) & 0xFF).astype(jnp.int32)
        oh = jax.nn.one_hot(digit, 256, dtype=jnp.int32)        # [N, 256]
        rank = jnp.take_along_axis(
            jnp.cumsum(oh, axis=0) - oh, digit[:, None], axis=1)[:, 0]
        counts = jnp.sum(oh, axis=0)
        base = jnp.cumsum(counts) - counts                      # exclusive
        dest = base[digit] + rank
        out_k = jnp.zeros_like(k).at[dest].set(k, unique_indices=True)
        out_p = jnp.zeros_like(p).at[dest].set(p, unique_indices=True)
        return out_k.astype(jnp.float32).sum() + out_p.sum()

    t_sort = _time(xla_sort, keys, payload, iters=iters)
    t_pass = _time(radix_pass, keys, payload, 0, iters=iters)
    return {"lax_sort_ms": t_sort, "radix_pass_ms": t_pass,
            "radix_4pass_ms": 4 * t_pass,
            "sort_at_floor": 4 * t_pass > t_sort}


def study_encoder_layers(iters: int) -> dict:
    """(b): encoder layers 1–3 standalone at whole-scene shapes."""
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.models.fold import fold_inference

    cfg = presets.get("scannet_whole_scene")
    model, variables = init_model(cfg)
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)

    rng = np.random.default_rng(1)
    N = cfg.data.num_points
    xyz = jnp.asarray(rng.uniform(0, 4, (1, N, 3)).astype(np.float32))
    mask = jnp.ones((1, N), bool)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def encode0(v, x, m, k):
        return model.apply(v, 0, x, x, m, False,
                           method="encode_layer", rngs={"cagq": k})

    l1 = encode0(variables, xyz, mask, key)
    float(l1[1].sum())   # sync via scalar fetch

    @jax.jit
    def encode0_s(v, x, m, k):
        out = encode0(v, x, m, k)
        return out[1].astype(jnp.float32).sum()

    @jax.jit
    def encode123_s(v, x, f, m, k):
        for i in (1, 2, 3):
            x, f, m = model.apply(
                v, i, x, f, m, False, method="encode_layer",
                rngs={"cagq": jax.random.fold_in(k, i)})
        return f.astype(jnp.float32).sum()

    t0 = _time(encode0_s, variables, xyz, mask, key, iters=iters)
    t123 = _time(encode123_s, variables, *l1, key, iters=iters)

    # row-rate floor for the L1-L3 gathers: per layer, the dominant row
    # sets are the winner gather (M*K rows) + context-run gather
    rows = sum(l.n_centers * l.k_neighbors
               for l in cfg.model.layers[1:])
    floor_ms = rows / 234e6 * 1e3
    return {"encode0_ms": t0, "encode123_ms": t123,
            "l123_winner_rows": rows,
            "winner_gather_floor_ms": floor_ms}


def study_bytes(iters: int) -> dict:
    """(c): whole-forward bytes accessed vs busy time — is the pipeline at
    the HBM bandwidth floor?"""
    from bench import _busy_ms_per_iter, _scene_points
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.models.fold import fold_inference
    from gridgcn_tpu.utils.profiling import trace

    cfg = presets.get("scannet_whole_scene")
    model, variables = init_model(cfg)
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)
    N = cfg.data.num_points

    @jax.jit
    def forward(v, x, m, k):
        return model.apply(v, x, None, m, train=False,
                           rngs={"cagq": k}).sum()

    rng = jax.random.PRNGKey(0)
    xyz = _scene_points("surface", 1, N, rng)
    mask = jnp.ones((1, N), bool)
    for _ in range(2):
        float(forward(variables, xyz, mask, rng))

    ca = forward.lower(variables, xyz, mask, rng).compile().cost_analysis()
    byts = float(ca.get("bytes accessed", 0.0))
    tdir = tempfile.mkdtemp(prefix="floor_bytes_tr_")
    with trace(tdir):
        o = None
        for _ in range(10):
            o = forward(variables, xyz, mask, rng)
        float(o)
    busy = _busy_ms_per_iter(tdir, 10)
    floor_ms = byts / HBM_BYTES_PER_S * 1e3
    return {"bytes_accessed": byts, "busy_ms": busy,
            "hbm_floor_ms": floor_ms,
            "bandwidth_bound_frac": (floor_ms / busy) if busy else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--parts", nargs="+", default=["sort", "enc", "bytes"])
    args = ap.parse_args()

    out = {}
    if "sort" in args.parts:
        out["sort"] = study_sort(args.iters)
        print("SORT " + json.dumps(out["sort"]), flush=True)
    if "enc" in args.parts:
        out["enc"] = study_encoder_layers(args.iters)
        print("ENC " + json.dumps(out["enc"]), flush=True)
    if "bytes" in args.parts:
        out["bytes"] = study_bytes(args.iters)
        print("BYTES " + json.dumps(out["bytes"]), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Refresh the cls preset latencies and decompose the CAS premium
(VERDICT r4 #8 — the 9.3 ms `modelnet40_cas` figure was three rounds
stale, and no study had attributed its gap over `modelnet40_full`).

Protocol: folded inference (the bench path), batch 16 × 1024 pts, the
scalar-fetch pipelined timing, BRACKETED — `modelnet40_full` is measured
first and again last, and the bracket spread bounds drift. The CAS
decomposition sweeps `cas_iters` on the cas preset (0 challenge rounds =
RVS initialization + CAS machinery compiled out of the swap loop but
sampler still 'cas'), attributing the premium between the Jacobi
challenge rounds (stencil + resampling) and everything else.

Usage: python scripts/study_cas_premium.py [--iters 40]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=40, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def build(cfg):
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.models.fold import fold_inference

    model, variables = init_model(cfg)
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)

    @jax.jit
    def forward(variables, xyz, mask, key):
        return model.apply(variables, xyz, None, mask, train=False,
                           rngs={"cagq": key}).sum()

    B, N = 16, cfg.data.num_points
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (B, N, 3), minval=-1.0, maxval=1.0)
    mask = jnp.ones((B, N), bool)
    return forward, (variables, xyz, mask, rng)


def cas_variant(base, iters_per_layer):
    layers = tuple(dataclasses.replace(s, cas_iters=iters_per_layer)
                   for s in base.model.layers)
    return dataclasses.replace(
        base, name=f"{base.name}+iters{iters_per_layer}",
        model=dataclasses.replace(base.model, layers=layers))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    from gridgcn_tpu.configs import presets

    runs = [("modelnet40_full (open)", presets.get("modelnet40_full")),
            ("modelnet40_cas", presets.get("modelnet40_cas")),
            ("modelnet40_compact", presets.get("modelnet40_compact")),
            ("cas iters=1", cas_variant(presets.get("modelnet40_cas"), 1)),
            ("cas iters=0", cas_variant(presets.get("modelnet40_cas"), 0)),
            ("modelnet40_full (close)", presets.get("modelnet40_full"))]
    out = {}
    for name, cfg in runs:
        fwd, fargs = build(cfg)
        out[name] = timed(fwd, *fargs, iters=args.iters)
        print(f"{name:28s} {out[name]:7.2f} ms/batch-16", flush=True)

    o, c = out["modelnet40_full (open)"], out["modelnet40_full (close)"]
    print(f"bracket drift: {abs(c - o):.2f} ms ({abs(c / o - 1) * 100:.1f}%)")
    full = (o + c) / 2
    cas2 = out["modelnet40_cas"]
    print(f"CAS premium: {cas2 - full:+.2f} ms over full "
          f"({(cas2 / full - 1) * 100:+.1f}%)")
    print(f"  challenge rounds (iters 0→2): "
          f"{cas2 - out['cas iters=0']:+.2f} ms")
    print(f"  sampler plumbing at 0 rounds vs rvs: "
          f"{out['cas iters=0'] - full:+.2f} ms")


if __name__ == "__main__":
    main()

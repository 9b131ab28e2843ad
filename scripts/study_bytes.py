"""Per-buffer HBM byte attribution of the whole-scene forward (round 5).

Round 4 reported the pipeline at 94.9% of the HBM-bandwidth floor for the
9.56 GB cost_analysis() charges per scene. THE 9.56 GB IS A COST-MODEL
ARTIFACT: XLA's HloCostAnalysis charges a gather for (a multiple of) its
FULL table operand, not the rows it touches — calibrated in this study's
`--calibrate` mode, where a 1M-row gather out of a 100 MB table (touching
~8 MB) is charged 4.21 GB. This study produces the HONEST attribution:

  * every ENTRY-level instruction (post-fusion = one launched kernel) is
    charged operand+output bytes — the dense-traffic accounting;
  * gathers (top-level or inside fusions) have their table operand
    discounted to the bytes actually touched (rows × row bytes, capped at
    the table size); scatters charge indices + updates + written rows, not
    the full base;
  * per-class row counts are collected so gather/scatter rows can be
    priced at the MEASURED DMA descriptor rate (135–234 M rows/s,
    docs/design.md §10) instead of at bandwidth.

The output is the per-class table for design.md §14 and the honest
composite floor: bytes at 819 GB/s for dense work + rows at the descriptor
rate for gathers/scatters.

Usage:
    python scripts/study_bytes.py [--preset scannet_whole_scene] [--topn 40]
    python scripts/study_bytes.py --group     # aggregate by source op_name
    python scripts/study_bytes.py --calibrate # gather-overcharge micro-proof
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

# NOTE: the tunneled TPU plugin registers via sitecustomize on the
# PRE-SET PYTHONPATH (/root/.axon_site) — overriding PYTHONPATH instead of
# appending breaks backend init. The in-process insert sidesteps that
# (every study script does this).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gridgcn_tpu.utils.hlocost import attribute, parse_computations  # noqa: E402,F401
from gridgcn_tpu.utils.hw import (  # noqa: E402
    DMA_ROWS_PER_S, V5E_HBM_BYTES_PER_S)

HBM_BYTES_PER_S = V5E_HBM_BYTES_PER_S


def build_forward(preset: str):
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import build_model, init_model
    from gridgcn_tpu.models.fold import fold_inference

    cfg = presets.get(preset)
    N = cfg.data.num_points
    B = cfg.data.batch_size
    model, variables = init_model(cfg)
    cfg, variables = fold_inference(cfg, variables)
    model = build_model(cfg.model)

    @jax.jit
    def forward(variables, xyz, mask, key):
        logits = model.apply(variables, xyz, None, mask, train=False,
                             rngs={"cagq": key})
        return logits.sum()

    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (B, N, 3), minval=0.0, maxval=6.0)
    mask = jnp.ones((B, N), bool)
    return forward, (variables, xyz, mask, rng)


def summarize(rows):
    """Per-class totals + the honest composite floor."""
    cls = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        c = cls[r["class"]]
        c[0] += r["bytes"]
        c[1] += r["touched"]
        c[2] += r["rows"]
        c[3] += 1
    print(f"{'class':<12} {'n':>5} {'dense GB':>9} {'touched GB':>11} "
          f"{'Mrows':>8} {'bw ms':>7} {'row ms':>7}")
    tot_bw = tot_row = 0.0
    for k, (b, t, rws, n) in sorted(cls.items(), key=lambda kv: -kv[1][1]):
        bw_ms = t / HBM_BYTES_PER_S * 1e3
        row_ms = rws / DMA_ROWS_PER_S * 1e3
        tot_bw += bw_ms
        tot_row += row_ms
        print(f"{k:<12} {n:5d} {b / 1e9:9.3f} {t / 1e9:11.3f} "
              f"{rws / 1e6:8.2f} {bw_ms:7.3f} {row_ms:7.3f}")
    print(f"{'TOTAL':<12} {sum(c[3] for c in cls.values()):5d} "
          f"{sum(c[0] for c in cls.values()) / 1e9:9.3f} "
          f"{sum(c[1] for c in cls.values()) / 1e9:11.3f} "
          f"{sum(c[2] for c in cls.values()) / 1e6:8.2f} "
          f"{tot_bw:7.3f} {tot_row:7.3f}")
    print(f"# composite floor (max(bw, rows) per class is pessimistic; "
          f"sum shown): bytes-at-819GB/s {tot_bw:.2f} ms + rows-at-234M/s "
          f"{tot_row:.2f} ms")


def calibrate():
    """Micro-proof that cost_analysis overcharges gathers (docstring)."""
    @jax.jit
    def f(x, idx):
        return (x * 2.0)[idx].sum()

    x = jnp.zeros((25_000_000,), jnp.float32)       # 100 MB table
    idx = jnp.zeros((1_000_000,), jnp.int32)        # 1M gathered rows = 4 MB
    c = f.lower(x, idx).compile()
    ca = c.cost_analysis()
    rows = attribute(c.as_text())
    print("program: y = (x*2)[idx].sum(); x = 100 MB, idx = 1M rows")
    print(f"cost_analysis 'bytes accessed': "
          f"{float(ca.get('bytes accessed', 0)) / 1e9:.3f} GB")
    print(f"dense operand+output accounting: "
          f"{sum(r['bytes'] for r in rows) / 1e9:.3f} GB")
    print(f"honest touched accounting:       "
          f"{sum(r['touched'] for r in rows) / 1e9:.3f} GB "
          f"(expected ~0.21: 100 read + 100 write + 4 idx + 4 out)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="scannet_whole_scene")
    p.add_argument("--topn", type=int, default=40)
    p.add_argument("--group", action="store_true",
                   help="aggregate rows by source op_name prefix")
    p.add_argument("--calibrate", action="store_true",
                   help="run the gather-overcharge micro-proof and exit")
    args = p.parse_args(argv)

    if args.calibrate:
        calibrate()
        return

    forward, fargs = build_forward(args.preset)
    compiled = forward.lower(*fargs).compile()
    try:
        ca = compiled.cost_analysis()
        total_ca = float(ca.get("bytes accessed", 0.0))
    except Exception:
        total_ca = 0.0
    hlo = compiled.as_text()
    rows = attribute(hlo)
    total = sum(r["bytes"] for r in rows)
    touched = sum(r["touched"] for r in rows)
    print(f"# instructions: {len(rows)}; dense {total / 1e9:.3f} GB, "
          f"touched {touched / 1e9:.3f} GB, cost_analysis "
          f"{total_ca / 1e9:.3f} GB", file=sys.stderr)

    summarize(rows)
    print()
    if args.group:
        groups = collections.defaultdict(lambda: [0, 0, 0])
        for r in rows:
            key = r["op_name"] or f"<{r['opcode']}>"
            key = "/".join(key.split("/")[:-1]) or key
            groups[key][0] += r["touched"]
            groups[key][1] += r["rows"]
            groups[key][2] += 1
        print(f"{'tGB':>8} {'Mrows':>7} {'n':>4}  scope")
        for k, (b, rws, n) in sorted(groups.items(),
                                     key=lambda kv: -kv[1][0])[:args.topn]:
            print(f"{b / 1e9:8.3f} {rws / 1e6:7.2f} {n:4d}  {k[:115]}")
    else:
        print(f"{'tGB':>8} {'dGB':>8} {'Mrows':>7} {'class':<11} op_name")
        for r in rows[:args.topn]:
            print(f"{r['touched'] / 1e9:8.3f} {r['bytes'] / 1e9:8.3f} "
                  f"{r['rows'] / 1e6:7.2f} {r['class']:<11} "
                  f"{r['op_name'][:105]}")


if __name__ == "__main__":
    main()

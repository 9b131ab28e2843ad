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
import re
import sys

# PYTHONPATH breaks the tunneled TPU plugin's discovery in this environment;
# the in-process insert is the working pattern (every study script does this)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "s4": 0.5, "u4": 0.5, "pred": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples by summing)."""
    total = 0.0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return int(total)


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\))|(?:\w+\[[\d,]*\](?:\{[^}]*\})?))\s*([\w\-]+)\((.*)$"
)
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^{]*)?\{\s*$")
_SLICE_RE = re.compile(r"slice_sizes=\{([\d,]*)\}")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")

# ops that pass their input through without touching new memory when we
# walk a fused gather's table operand back to a fusion parameter
_TRANSPARENT = ("pad", "bitcast", "reshape", "copy", "convert", "transpose",
                "clamp", "slice")


class Instr:
    __slots__ = ("name", "out_bytes", "opcode", "operands", "op_name", "text",
                 "out_elems")

    def __init__(self, name, out_bytes, out_elems, opcode, operands, op_name,
                 text):
        self.name = name
        self.out_bytes = out_bytes
        self.out_elems = out_elems
        self.opcode = opcode
        self.operands = operands
        self.op_name = op_name
        self.text = text


def shape_elems(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n
    return total


def parse_computations(hlo: str) -> dict[str, list[Instr]]:
    """Map computation name -> list of parsed instructions."""
    comps: dict[str, list[Instr]] = {}
    cur: list[Instr] | None = None
    for ln in hlo.splitlines():
        mc = _COMP_RE.match(ln)
        if mc and "=" not in ln.split("{")[0]:
            name = "ENTRY" if mc.group(1) else mc.group(2)
            cur = comps.setdefault(name, [])
            continue
        if ln.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, shape_str, opcode, rest = m.groups()
        depth = 1
        end = len(rest)
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        operands = re.findall(r"%([\w.\-]+)", rest[:end])
        opm = _OPNAME_RE.search(ln)
        cur.append(Instr(name, shape_bytes(shape_str),
                         shape_elems(shape_str), opcode, operands,
                         opm.group(1) if opm else "", ln))
    return comps


def _trace_to_param(comp: list[Instr], name: str) -> int | None:
    """Walk a value in a fused computation back through transparent ops to a
    parameter; return the parameter number or None."""
    by_name = {i.name: i for i in comp}
    seen = 0
    while name in by_name and seen < 20:
        instr = by_name[name]
        if instr.opcode == "parameter":
            mp = re.search(r"parameter\((\d+)\)", instr.text)
            return int(mp.group(1)) if mp else None
        if instr.opcode in _TRANSPARENT and instr.operands:
            name = instr.operands[0]
            seen += 1
            continue
        return None
    return None


def attribute(hlo: str):
    """Honest per-ENTRY-instruction byte/row attribution (module docstring)."""
    comps = parse_computations(hlo)
    entry = comps.get("ENTRY", [])
    shapes = {i.name: i for i in entry}
    out = []
    for ins in entry:
        if ins.opcode in ("parameter", "constant", "get-tuple-element",
                          "tuple", "bitcast"):
            continue
        operand_b = [shapes[o].out_bytes for o in ins.operands
                     if o in shapes]
        dense = ins.out_bytes + sum(operand_b)
        touched = dense
        rows = 0
        klass = "fusion"
        # find gather/scatter/sort work either at top level or inside the
        # called fused computation
        inner: list[Instr] = [ins]
        comp = None
        if ins.opcode == "fusion":
            mcalls = _CALLS_RE.search(ins.text)
            if mcalls and mcalls.group(1) in comps:
                comp = comps[mcalls.group(1)]
                inner = comp
        for g in inner:
            if g.opcode == "gather":
                klass = "gather"
                msl = _SLICE_RE.search(g.text)
                slice_elems = 1
                if msl:
                    for d in msl.group(1).split(","):
                        if d:
                            slice_elems *= int(d)
                g_rows = max(1, g.out_elems // max(1, slice_elems))
                rows += g_rows
                # discount the table operand to rows actually touched
                tbl = g.operands[0] if g.operands else None
                tbl_bytes = None
                if comp is None:   # top-level gather
                    if tbl in shapes:
                        tbl_bytes = shapes[tbl].out_bytes
                else:
                    pnum = _trace_to_param(comp, tbl) if tbl else None
                    if pnum is not None and pnum < len(ins.operands) and \
                            ins.operands[pnum] in shapes:
                        tbl_bytes = shapes[ins.operands[pnum]].out_bytes
                if tbl_bytes:
                    row_bytes = max(1, g.out_bytes // max(1, g_rows))
                    touched -= tbl_bytes - min(tbl_bytes, g_rows * row_bytes)
            elif g.opcode == "scatter":
                klass = "scatter"
                # scatter(base, indices, updates): real traffic is indices +
                # updates read + rows written; the base is aliased in place
                # (its dense init was charged at its producer)
                upd = g.operands[2] if len(g.operands) > 2 else None
                upd_b = None
                if comp is None:
                    if upd in shapes:
                        upd_b = shapes[upd].out_bytes
                    base = g.operands[0] if g.operands else None
                    if base in shapes:
                        touched -= shapes[base].out_bytes
                else:
                    pnum = _trace_to_param(comp, upd) if upd else None
                    if pnum is not None and pnum < len(ins.operands) and \
                            ins.operands[pnum] in shapes:
                        upd_b = shapes[ins.operands[pnum]].out_bytes
                    bnum = _trace_to_param(comp, g.operands[0]) \
                        if g.operands else None
                    if bnum is not None and bnum < len(ins.operands) and \
                            ins.operands[bnum] in shapes:
                        touched -= shapes[ins.operands[bnum]].out_bytes
                if upd_b:
                    rows += max(1, upd_b // 4)   # element scatters: 1 row/elem
                    # output is the full table but only `rows` cells written
                    touched -= ins.out_bytes - min(ins.out_bytes, upd_b)
            elif g.opcode == "sort":
                klass = "sort"
            elif g.opcode == "custom-call":
                if klass == "fusion":
                    klass = "custom-call"
            elif g.opcode == "dot":
                if klass == "fusion":
                    klass = "dot"
        touched = max(touched, 0)
        out.append({"name": ins.name, "opcode": ins.opcode, "class": klass,
                    "bytes": dense, "touched": touched, "rows": rows,
                    "out_bytes": ins.out_bytes, "op_name": ins.op_name})
    out.sort(key=lambda r: -r["touched"])
    return out


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


HBM_BYTES_PER_S = 8.19e11          # public v5e figure (bench.py)
DMA_ROWS_PER_S = 234e6             # measured descriptor rate, design.md §10


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

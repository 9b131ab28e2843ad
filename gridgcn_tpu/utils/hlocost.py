"""Honest per-kernel HBM traffic attribution from optimized HLO text.

XLA's `compiled.cost_analysis()["bytes accessed"]` charges a gather for (a
multiple of) its FULL table operand, not the rows it touches — on a
gather-heavy program it overstates real HBM traffic ~8× (micro-proof:
`python scripts/study_bytes.py --calibrate`, where a 1M-row gather out of a
100 MB table is billed 4.21 GB). Round 4's bench metric
(`bandwidth_bound_frac` = 94.9%) was built on that inflated figure.

This module parses a compiled module's optimized HLO (ENTRY computation =
one instruction per launched kernel) and charges every instruction its
operand+output bytes, with gathers/scatters discounted to what they
actually touch:

  * gather — table operand charged rows × row-bytes (from `slice_sizes`),
    capped at the table size; indices + output charged in full. Works for
    top-level gathers and gathers inside fusions (the table is traced back
    through pad/reshape/convert/... to a fusion parameter).
  * scatter — indices + updates read + updated cells written; the base
    operand is aliased in place and its dense init was charged at its
    producer.
  * sort / custom-call / dot are classified so callers can price them at
    their own measured rates (a sort's multi-pass traffic and a Pallas
    kernel's internal traffic are NOT expanded here — both are priced by
    measured per-op studies, design.md §11).

Gather/scatter ROW counts are collected alongside, because on TPU the
gather cost is the DMA descriptor rate (135–234 M rows/s measured,
design.md §10), not bytes. `floor_ms` combines both: touched bytes at the
HBM floor + rows at the descriptor rate — the honest composite lower bound
the bench reports as `floor_frac` (replacing round-4's
`bandwidth_bound_frac`).
"""

from __future__ import annotations

import collections
import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "s4": 0.5, "u4": 0.5, "pred": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
    r"((?:\([^)]*\))|(?:\w+\[[\d,]*\](?:\{[^}]*\})?))\s*([\w\-]+)\((.*)$"
)
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^{]*)?\{\s*$")
_SLICE_RE = re.compile(r"slice_sizes=\{([\d,]*)\}")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")

# ops that pass their input through without touching new memory when we
# walk a fused gather's table operand back to a fusion parameter
_TRANSPARENT = ("pad", "bitcast", "reshape", "copy", "convert", "transpose",
                "clamp", "slice")
# elementwise ops fused INTO a gather's table operand (compute-on-demand:
# only the gathered rows are evaluated) — walk through to the table param
# via the first non-constant operand
_ELEMENTWISE = ("multiply", "add", "subtract", "divide", "maximum",
                "minimum", "negate", "abs", "exponential", "select",
                "and", "or", "xor", "compare")
_VALUELESS = ("constant", "iota", "broadcast")


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
        if instr.opcode in _ELEMENTWISE:
            nxt = None
            for o in instr.operands:
                prod = by_name.get(o)
                if prod is not None and prod.opcode not in _VALUELESS:
                    nxt = o
                    break
            if nxt is not None:
                name = nxt
                seen += 1
                continue
        return None
    return None


def attribute(hlo: str) -> list[dict]:
    """Honest per-ENTRY-instruction byte/row attribution (module docstring).

    Returns rows sorted by touched bytes, each:
    {name, opcode, class, bytes (dense), touched, rows, out_bytes, op_name}.
    """
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


def class_totals(rows: list[dict]) -> dict[str, dict]:
    """Aggregate attribution rows by op class."""
    cls: dict[str, dict] = collections.defaultdict(
        lambda: {"n": 0, "dense": 0, "touched": 0, "rows": 0})
    for r in rows:
        c = cls[r["class"]]
        c["n"] += 1
        c["dense"] += r["bytes"]
        c["touched"] += r["touched"]
        c["rows"] += r["rows"]
    return dict(cls)


def floor_ms(rows: list[dict]) -> dict:
    """Composite lower bound: touched bytes at the HBM floor plus
    gather/scatter rows at the measured DMA descriptor rate. Sorts and
    Pallas custom-calls are charged bytes-only here (their true cost is
    higher — multi-pass / MXU-bound; see design.md §11), so this floor is
    intentionally OPTIMISTIC: measured busy time should sit above it."""
    from gridgcn_tpu.utils.hw import DMA_ROWS_PER_S, V5E_HBM_BYTES_PER_S

    touched = sum(r["touched"] for r in rows)
    nrows = sum(r["rows"] for r in rows)
    bw_ms = touched / V5E_HBM_BYTES_PER_S * 1e3
    row_ms = nrows / DMA_ROWS_PER_S * 1e3
    return {"touched_bytes": touched, "rows": nrows,
            "bw_ms": bw_ms, "row_ms": row_ms,
            "floor_ms": bw_ms + row_ms}

"""Device-trace analysis: aggregate jax.profiler xplane dumps by op.

The reference project read its numbers off hand-timed synced forwards;
here every optimization in BASELINE.md was driven by device traces
(docs/design.md §7). This module turns a `jax.profiler.trace` logdir into
the two tables that matter on a TPU timeline:

  * total per-op duration — misleading for async ops (copy-start spans
    overlap real compute, so the column sums to far more than wall time);
  * EXCLUSIVE per-op time — a sweep over event boundaries attributing each
    instant to the innermost (most recently started) active op. Summing it
    reproduces device busy time, so the top rows are the actual critical
    path. The z-window gather and one-hot CE wins were found this way.

Usage:
    from gridgcn_tpu.utils.profiling import trace
    with trace("/tmp/tr"):
        ...                      # run the jitted step a few times
    python -m gridgcn_tpu.utils.traceview /tmp/tr --iters 10

Parsing needs tensorflow's xplane proto (present in this environment);
the attribution core (`exclusive_times`) is dependency-free.
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Iterable, List, Tuple

Event = Tuple[int, int, str]   # (start_ps, end_ps, op name)


def exclusive_times(events: Iterable[Event]) -> dict[str, int]:
    """Exclusive (self) time per op name, in picoseconds.

    Each instant of the timeline is attributed to the most recently started
    still-active event ("innermost"), so fully-overlapped async spans (e.g.
    copy-start waiting out a fusion) only get charged for the time nothing
    else runs inside them. The values sum to total busy time.
    """
    bounds: List[Tuple[int, int, str]] = []
    for s, e, n in events:
        if e > s:
            bounds.append((s, 0, n))
            bounds.append((e, 1, n))
    bounds.sort(key=lambda b: (b[0], b[1]))

    excl: dict[str, int] = collections.defaultdict(int)
    active: List[str] = []          # started-order stack (latest last)
    prev: int | None = None
    for t, kind, n in bounds:
        if prev is not None and active and t > prev:
            excl[active[-1]] += t - prev
        if kind == 0:
            active.append(n)
        else:
            for i in range(len(active) - 1, -1, -1):
                if active[i] == n:
                    del active[i]
                    break
        prev = t
    return dict(excl)


def load_events(logdir: str) -> dict[str, List[Event]]:
    """Read every device plane's "XLA Ops" line from a profiler logdir.

    Returns one event list PER device plane (keyed by plane name): each
    core has its own timeline, and the innermost-active attribution of
    `exclusive_times` is only meaningful within one core — merging planes
    would let an op on core 1 steal exclusive time from a concurrently
    running op on core 0."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    per_plane: dict[str, List[Event]] = collections.defaultdict(list)
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            events = per_plane[f"{p}:{plane.name}"]
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                base = line.timestamp_ns * 1000
                for ev in line.events:
                    start = base + ev.offset_ps
                    events.append((start, start + ev.duration_ps,
                                   emeta.get(ev.metadata_id, "?")))
    for events in per_plane.values():
        events.sort()
    return {k: v for k, v in per_plane.items() if v}


def report(logdir: str, iters: int = 1, topn: int = 30) -> str:
    planes = load_events(logdir)
    if not planes:
        return (f"no device-plane XLA Ops events under {logdir} "
                "(CPU-backend traces carry none; run on TPU)")
    # attribute within each core's own timeline, then sum across cores
    excl: dict[str, int] = collections.defaultdict(int)
    for events in planes.values():
        for n, ps in exclusive_times(events).items():
            excl[n] += ps
    span = max(e[-1][1] for e in planes.values()) - min(
        e[0][0] for e in planes.values())
    busy = sum(excl.values())
    lines = [
        f"span {span / 1e9:.2f} ms, busy {busy / 1e9:.2f} ms, "
        f"idle {(span - busy) / 1e9:.2f} ms"
        + (f"  ({iters} iters => {busy / iters / 1e9:.2f} ms/iter busy)"
           if iters > 1 else "")
    ]
    for n, ps in sorted(excl.items(), key=lambda kv: -kv[1])[:topn]:
        lines.append(f"{ps / iters / 1e9:9.4f} ms  {n[:110]}")
    return "\n".join(lines)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("logdir")
    p.add_argument("--iters", type=int, default=1,
                   help="iterations captured; per-op times are divided by it")
    p.add_argument("--topn", type=int, default=30)
    args = p.parse_args(argv)
    print(report(args.logdir, iters=args.iters, topn=args.topn))


if __name__ == "__main__":
    main()

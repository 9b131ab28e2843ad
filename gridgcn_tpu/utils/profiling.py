"""Tracing / profiling (SURVEY.md §5 'Tracing / profiling').

The reference times synced forward passes by hand (`mx.nd.waitall` pattern);
here: `jax.profiler` traces viewable in TensorBoard/Perfetto, plus a
steady-state timer built for remote-tunnel TPU backends where
`block_until_ready` is unreliable — a scalar fetch is the only honest sync,
and pipelining `iters` launches amortizes the host↔device round trip away.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/gridgcn_trace"):
    """Capture a device trace: `with trace('logs'): fn()` → TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def steady_state_time(fn: Callable[..., jax.Array], *args,
                      warmup: int = 2, iters: int = 10) -> float:
    """Seconds per call of `fn` (must return a scalar array) at steady state."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def annotate(name: str):
    """Named region in profiler traces (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def busy_ms_per_iter(logdir: str, iters: int) -> float | None:
    """Device-busy ms/iter from a captured trace (utils/traceview exclusive
    attribution summed over device planes). None if the xplane proto is
    unavailable or the trace has no device plane — callers stay usable on
    CPU backends. Busy time is the honest per-stage metric on the tunnel
    backend: wall time carries ~0.7-1.1 ms/call of launch+fetch overhead,
    which swamps small standalone kernels (bench.py headline entry and
    scripts/study_tier2_compute.py both use this)."""
    try:
        from gridgcn_tpu.utils.traceview import exclusive_times, load_events

        busy_ps = 0
        for events in load_events(logdir).values():
            busy_ps += sum(exclusive_times(events).values())
        return busy_ps / iters / 1e9 if busy_ps else None
    except Exception:
        return None

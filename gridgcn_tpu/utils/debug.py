"""Sanitizers / validation (SURVEY.md §5 'Race detection / sanitizers').

The reference validated its hand-written CUDA atomics by eyeball; here the
sort-based voxel build makes the write-race class unrepresentable by
construction (SURVEY §7 H2), and this module covers the remaining failure
modes:

  * capacity truncation (H1): `check_capacity` flags voxel tables whose nv
    silently drops too many points for a config;
  * NaN/Inf escapes: `debug_mode` turns on jax.debug_nans + disable_jit-free
    checks;
  * `checkify_call` runs a jitted function under jax.experimental.checkify
    with index/NaN checks promoted to errors.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from gridgcn_tpu.ops.voxelize import VoxelTable, capacity_stats


def check_capacity(table: VoxelTable, max_dropped_frac: float = 0.05):
    """Host-side capacity audit: raises if nv drops more than the budget.

    Run on a representative batch when tuning a config's (resolution, nv)
    — not in the hot path (SURVEY §7 H1)."""
    stats = capacity_stats(table)
    frac = float(jnp.max(stats["dropped_frac"]))
    if frac > max_dropped_frac:
        raise ValueError(
            f"voxel table drops {frac:.1%} of points (> {max_dropped_frac:.1%}); "
            f"raise nv (={table.nv}) or resolution (={table.resolution})")
    return stats


def audit_layer0_capacity(cfg, points, budget: float = 0.05,
                          max_clouds: int = 8) -> dict:
    """Layer-0 capacity audit on a representative sample of a dataset:
    what fraction of points does layers[0]'s (resolution, nv) drop?

    Real datasets have different occupancy skew than the synthetic scenes
    the presets were sized on, so capacity mis-sizing must be caught at
    step 0 — as a logged number — not discovered later as silent accuracy
    loss (VERDICT r2 next-round #9, SURVEY §7 H1). Returns a JSON-ready
    dict; `over_budget` flags a worst-cloud dropped fraction above
    `budget` (the latency/accuracy trade is quantified in design.md §12)."""
    from gridgcn_tpu.ops.voxelize import build_voxel_table

    spec = cfg.model.layers[0]
    pts = jnp.asarray(points[:max_clouds])
    mask = jnp.ones(pts.shape[:2], bool)
    table = build_voxel_table(pts, mask, spec.resolution, spec.nv,
                              jax.random.PRNGKey(0))
    st = capacity_stats(table)
    frac = float(jnp.max(st["dropped_frac"]))
    return {
        "layer": 0, "resolution": spec.resolution, "nv": spec.nv,
        "clouds_sampled": int(pts.shape[0]),
        "dropped_frac": round(frac, 5),
        "occupied_voxels": int(jnp.max(st["occupied_voxels"])),
        "budget": budget, "over_budget": frac > budget,
    }


def propose_layer0_capacity(cfg, points, budget: float = 0.05,
                            max_clouds: int = 8) -> dict:
    """Smallest layer-0 capacity bump that brings the dropped-point
    fraction within budget (VERDICT r3 #8, SURVEY §7 H1).

    Search mirrors the design.md §12 sweep, cheapest lever first: nv
    doubles from the configured value up to 64 (the sweep measured nv
    bumps accuracy-neutral at ~+0.6 ms/scene per 4 slots); if even nv=64
    over-drops, the resolution doubles once with the configured nv
    (finer grid = fewer points per voxel; §12 measured the accuracy cost
    of coarser grids, not finer). Returns the proposal + every point
    audited so the caller can log the evidence."""
    from gridgcn_tpu.ops.voxelize import build_voxel_table, capacity_stats

    spec = cfg.model.layers[0]
    pts = jnp.asarray(points[:max_clouds])
    mask = jnp.ones(pts.shape[:2], bool)

    def frac(res, nv):
        table = build_voxel_table(pts, mask, res, nv, jax.random.PRNGKey(0))
        return float(jnp.max(capacity_stats(table)["dropped_frac"]))

    tried = []

    def audit(res, nv):
        f = frac(res, nv)
        tried.append({"resolution": res, "nv": nv,
                      "dropped_frac": round(f, 5)})
        return f

    res, nv = spec.resolution, spec.nv
    f = audit(res, nv)
    while f > budget and nv < 64:
        nv = min(2 * nv, 64)
        f = audit(res, nv)
    if f > budget:
        res, nv = 2 * spec.resolution, spec.nv
        f = audit(res, nv)
    return {"nv": nv, "resolution": res, "dropped_frac": round(f, 5),
            "budget": budget, "within_budget": f <= budget,
            "tried": tried}


@contextlib.contextmanager
def debug_mode():
    """NaN debugging for a scope: `with debug_mode(): train_step(...)`.
    Restores the PRIOR flag value on exit (a user running with
    JAX_DEBUG_NANS=1 keeps their global setting)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_call(fn: Callable, *args):
    """Run `fn` under jitted checkify float/index checks; raises on failure."""
    checked = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)
    err, out = jax.jit(checked)(*args)
    err.throw()
    return out

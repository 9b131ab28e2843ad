"""utils/hlocost: the honest HBM byte/row attribution (round 5).

The parser drives the bench's composite-floor metric (`floor_frac`), so
its accounting invariants are pinned here on small compiled programs:
dense programs charge operand+output, gathers are discounted to touched
rows (the calibration case where cost_analysis overbills ~20×), and the
class/row bookkeeping survives fusion.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.utils.hlocost import attribute, class_totals, floor_ms


def _compiled_text(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_dense_program_charges_operands_and_output():
    x = jnp.zeros((1024, 256), jnp.float32)          # 1 MB

    rows = attribute(_compiled_text(lambda a: a * 2.0 + 1.0, x))
    total = sum(r["touched"] for r in rows)
    # read 1 MB + write 1 MB, modulo small constants
    assert 1.9e6 < total < 2.4e6, total
    # dense programs: touched == dense accounting
    assert total == sum(r["bytes"] for r in rows)


def test_gather_discounted_to_touched_rows():
    table = jnp.zeros((1_000_000,), jnp.float32)     # 4 MB
    idx = jnp.zeros((1000,), jnp.int32)              # 1k rows = 4 KB

    def f(t, i):
        return (t * 2.0)[i].sum()

    rows = attribute(_compiled_text(f, table, idx))
    dense = sum(r["bytes"] for r in rows)
    touched = sum(r["touched"] for r in rows)
    # the multiply reads+writes the 4 MB table (8 MB); the gather touches
    # ~8 KB — dense accounting additionally bills the full 4 MB operand
    assert touched < dense, (touched, dense)
    assert touched < 9.5e6, touched
    cls = class_totals(rows)
    assert "gather" in cls
    assert cls["gather"]["rows"] == 1000
    fl = floor_ms(rows)
    assert fl["rows"] == 1000
    assert fl["floor_ms"] > 0
    # (the cost_analysis gather-overbilling proof is TPU-specific — run
    # `python scripts/study_bytes.py --calibrate` on hardware; XLA:CPU's
    # cost model does not overbill this program)


def test_scatter_charges_updates_not_base():
    base = jnp.zeros((1_000_000,), jnp.float32)      # 4 MB
    idx = jnp.arange(1000, dtype=jnp.int32)
    upd = jnp.ones((1000,), jnp.float32)

    def f(b, i, u):
        return b.at[i].set(u, unique_indices=True).sum()

    rows = attribute(_compiled_text(f, base, idx, upd))
    cls = class_totals(rows)
    if "scatter" in cls:                 # XLA may fuse it away on CPU
        # the scatter row itself must not be billed the 4 MB base twice
        sc = [r for r in rows if r["class"] == "scatter"]
        assert all(r["touched"] <= r["bytes"] for r in sc)
    # total stays near the real traffic — zeros init (4 MB write) + sum
    # read (4 MB) + a possibly materialized scatter output (4 MB on
    # backends that don't alias it) + update rows — not a base double-bill
    assert sum(r["touched"] for r in rows) < 1.35e7


def test_attribution_covers_a_model_forward():
    """End-to-end smoke on the real model graph (tiny config, CPU): every
    class total is non-negative and the attribution is non-empty."""
    from gridgcn_tpu.configs import presets
    from gridgcn_tpu.models.build import init_model

    cfg = presets.get("synthetic_tiny_seg")
    model, variables = init_model(cfg)
    B, N = 2, cfg.data.num_points
    xyz = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3))
    mask = jnp.ones((B, N), bool)

    def fwd(v, x, m, k):
        return model.apply(v, x, None, m, train=False,
                           rngs={"cagq": k}).sum()

    rows = attribute(_compiled_text(fwd, variables, xyz, mask,
                                    jax.random.PRNGKey(1)))
    assert len(rows) > 50
    cls = class_totals(rows)
    assert cls.get("gather", {}).get("rows", 0) > 0
    assert all(v["touched"] >= 0 for v in cls.values())
    assert sum(v["touched"] for v in cls.values()) > 0

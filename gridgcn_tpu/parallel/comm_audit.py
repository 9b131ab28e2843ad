"""F-22/F-24 communication-volume accounting (VERDICT r2 #6).

The multi-chip dryrun proves the sharded programs compile and execute; this
module answers the question the dryrun can't: *does the design scale?* It
accounts, from a config + mesh size, every byte each protocol moves over
ICI per step, and projects transfer time against the measured per-shard
compute so the expected scaling efficiency is a number, not a hope.

Collective inventory audited (all emitted by shard_map/GSPMD — SURVEY §2.4
F-24; there is no other comm path in the framework):

  * DP / spatially-sharded training: ONE gradient psum per step over all
    parameters (+ a few scalar metric psums and BN-stat pmeans, counted).
  * Tier 2 (`parallel.resident`): ONE all_gather assembling the layer-1
    level — each chip contributes its M1/D center share of
    (xyz f32[3] + feat[C1] + valid bool) and receives the other D-1 shares.
  * Tier 3 (`parallel.resident_ml`): per encoder level i ≥ 1, TWO ppermute
    ships (left+right neighbors) of H rows of (xyz[3] f32 + feat[C_i] +
    valid bool) — `exchange_boundary`; per decoder stage on a ghost-carrying
    level, TWO ppermute ships of H rows of the updated features —
    `refresh_ghosts`. H defaults to the shard's full center share
    (n_centers_i / D).

Transfer-time projection model (stated assumptions, not measurements):
one-directional ICI link bandwidth per the public v5e figures ≈ 45 GB/s;
the slab ring maps onto one torus axis, so the two ppermute directions ride
distinct links concurrently and the per-hop time is max(bytes_dir)/BW;
the gradient psum uses the standard ring cost 2·(D−1)/D · bytes / BW
(reduce_scatter + all_gather), a plain all_gather moves (D−1)/D of the
payload per chip (ADVICE r3 #3). DCN is out of scope (single-slice audit).
"""

from __future__ import annotations

import hashlib
import json
import warnings
from typing import Optional

import jax
import numpy as np

from gridgcn_tpu.configs.base import Config, to_dict
from gridgcn_tpu.utils.hw import ICI_BYTES_PER_S  # noqa: F401  (re-export)


def measurement_fingerprint(cfg: Config) -> str:
    """Structural fingerprint of everything a per-step hardware measurement
    depends on: the full model config plus the input shape. Measured anchors
    below are keyed by this, not by preset NAME (ADVICE r4 #1 / VERDICT r4
    weak #4): a config modified via dataclasses.replace that keeps its name
    must NOT inherit a stale measurement."""
    payload = {"model": to_dict(cfg.model),
               "num_points": cfg.data.num_points,
               "batch_size": cfg.data.batch_size}
    blob = json.dumps(payload, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]

# Ghost-compute tax anchor (VERDICT r3 weak #2): tier-3 per-shard compute
# is inflated by the static ghost buffers every sharded level carries
# through sampling/gather/GCA. AFFINE model, least-squares fit to the
# four mesh=1 DEVICE-BUSY points of the round-4 ghost-cap sweep
# (scripts/study_mesh1_overhead.py --ghost-sweep; design.md §13
# addendum 3): ratio = ghost/owned rows 0.25/0.5/1/2 → overhead
# +5.0/+8.4/+18.4/+33.2%. History of this constant, because each revision
# was a finding: r3 fit 0.155·ratio on one wall-clock point; the busy
# sweep then exposed an apparent +9.4% FIXED term — which the attribution
# study (study_tier3_fixed_overhead.py) traced to flash-kNN support
# padding quantizing ghost-extended rows up to a full 8192 chunk (60%
# MXU waste). With that kernel fix the sweep re-fits to near-linear:
# the protocol's true fixed cost is <1%, and what remains is honest
# ghost-row work. Stated assumption: the row-driven fraction of
# per-shard compute is roughly D-independent (the grid-table work that
# does not shrink with D makes the model conservative at high D).
GHOST_TAX_FIXED = 0.0096
GHOST_TAX_COEFF = 0.1631

# Per-config / per-mode ghost-tax fits (round 5, completing the 2×2 —
# `study_mesh1_overhead.py [--train] --ghost-sweep --preset ...`, mesh=1,
# one B=1 scene, device-busy timing, least squares over the ghost ratios
# 0.25/0.5/1/2):
#
#   | config (B=1 scene)           | eval fit          | train fit        |
#   |------------------------------|-------------------|------------------|
#   | scannet_whole_scene (N/M≈7.5)| 0.0096 + 0.1631·r | 0.0110 + 0.1465·r|
#   | scannet_seg scene  (N/M≈24)  | 0.0147 + 0.0382·r | 0.0342 + 0.0383·r|
#
#   (raw overhead points — whole_scene eval +5.0/+8.4/+18.4/+33.2%,
#    train +5.0/+7.8/+16.2/+30.3% over plain 16.92 ms busy;
#    scannet_seg eval +2.6/+3.5/+4.8/+9.3% over plain 7.73 ms busy,
#    train +4.6/+5.5/+6.8/+11.3% over plain 11.26 ms busy.)
#
# The round-5 reading: the slope is CONFIG-dependent, not MODE-dependent
# — within a config, eval and train slopes agree to the fit error, while
# across configs they differ 4×. Mechanism: the slope is the share of
# step time in CENTER-level work (the only work ghost rows inflate); the
# center-light scannet_seg scene step is dominated by N-sized dense work,
# so ghosts barely register, while the center-heavy whole-scene config
# keeps its high slope in both modes. (The r4 worry that the backward
# doubles the ghost toll is refuted: train slopes never exceed eval's.)
# Anchors are fingerprinted like every measurement; unmeasured configs
# fall back to the module-level eval fit above — the steepest measured
# slope, so the fallback is conservative. The small fixed terms are
# distributed protocol cost (study_tier3_fixed_overhead.py: no dominant
# op in either mode).
MEASURED_GHOST_TAX = {
    ("scannet_seg", "eval"): {"fixed": 0.0147, "coeff": 0.0382,
                              "fingerprint": "0c370ccbb15a3f2a"},
    ("scannet_seg", "train"): {"fixed": 0.0342, "coeff": 0.0383,
                               "fingerprint": "0c370ccbb15a3f2a"},
    ("scannet_whole_scene", "eval"): {"fixed": 0.0096, "coeff": 0.1631,
                                      "fingerprint": "3151239c4c9321ae"},
    ("scannet_whole_scene", "train"): {"fixed": 0.0110, "coeff": 0.1465,
                                       "fingerprint": "3151239c4c9321ae"},
}

# Tier-2 replicated fractions MEASURED on the real chip (scripts/
# study_tier2_compute.py, trace-driven device-busy split — wall time
# carries ~0.7-1.1 ms/call of tunnel launch overhead that inflates the
# small standalone replicated measurement; design.md §13 addendum 2).
# The config-only byte model below (`_tier2_stage_ms`) misses in BOTH
# directions across the two measured configs (whole-scene: model 0.144 vs
# measured 0.164; crop: model 0.354 vs measured 0.227), so no global
# scale factor transfers — the projection uses the measurement when one
# exists for the config and the raw model (±40% observed error band)
# otherwise. `tier2_replicated_fraction(cfg, anchored=False)` always
# returns the raw model, keeping it falsifiable against future runs.
# Each anchor is keyed by preset name AND pinned to the measurement
# fingerprint of the config it was measured on (round-4 presets); a
# same-named config whose structure differs refuses the anchor and falls
# back to the raw model with a warning (ADVICE r4 #1).
MEASURED_TIER2_REPL_FRAC = {
    "scannet_whole_scene": {"frac": 0.1641,
                            "fingerprint": "3151239c4c9321ae"},
    "scannet_seg": {"frac": 0.2271, "fingerprint": "0c370ccbb15a3f2a"},
}

# Measured single-chip DEVICE-BUSY anchors the dryrun's projection rides
# (VERDICT r4 weak #5: the r4 artifact carried volumes but no efficiencies).
# Provenance: whole-scene inference = the bench trace's busy_ms on the
# surface scene (BENCH_r04; the inference surface of the flagship scannet
# family, round-5 run after the interp-layout fix); train step = the
# default-path (bf16 + f32 BN) full train-step wall time from the same
# round-5 bench — trace busy runs ~1 ms lower through the tunnel, making
# the projected efficiencies conservative. Fingerprinted like every
# measured anchor; re-measure with bench.py when stale.
MEASURED_BUSY_MS = {
    "whole_scene_inference": {"ms": 12.13,
                              "preset": "scannet_whole_scene",
                              "fingerprint": "3151239c4c9321ae"},
    "scannet_seg_train_step": {"ms": 30.26,
                               "preset": "scannet_seg",
                               "fingerprint": "0c370ccbb15a3f2a"},
    # B=1 SCENE-shaped steps (the surfaces spatial sharding actually
    # shards; mesh=1 sweep plains, round 5) — note the scene step is NOT
    # the crop-DP step: one 65536-pt scene samples the per-cloud center
    # budget once (2720 centers) where 8x8192 crops sample it 8x, which
    # is why the scene step is ~2.7x cheaper per point
    "scannet_seg_scene_inference": {"ms": 7.73,
                                    "preset": "scannet_seg",
                                    "fingerprint": "0c370ccbb15a3f2a"},
    "scannet_seg_scene_train_step": {"ms": 11.26,
                                     "preset": "scannet_seg",
                                     "fingerprint": "0c370ccbb15a3f2a"},
    "whole_scene_scene_train_step": {"ms": 16.92,
                                     "preset": "scannet_whole_scene",
                                     "fingerprint": "3151239c4c9321ae"},
}


def _normalize_caps(ghost_cap, n_layers: int) -> tuple:
    """Same semantics as make_resident_ml_forward: int broadcasts, a
    sequence (tuple/list/ndarray — calibrate_ghost_cap output either way)
    must have one entry per level."""
    caps = (tuple(int(c) for c in ghost_cap)
            if isinstance(ghost_cap, (tuple, list, np.ndarray))
            else (int(ghost_cap),) * n_layers)
    if len(caps) != n_layers:
        raise ValueError(f"ghost_cap sequence needs {n_layers} entries, "
                         f"got {len(caps)}")
    return caps


def ghost_compute_tax(cfg: Config, n_devices: int, ghost_cap=0,
                      train: bool = False) -> float:
    """Projected fractional per-shard compute inflation from the tier-3
    protocol: fixed + coeff × Σ(2·H_i) / Σ(n_centers_i / D) — affine in
    the ghost/owned row ratio. (fixed, coeff) come from the per-config /
    per-mode measured fits (MEASURED_GHOST_TAX, fingerprint-checked);
    unmeasured configs fall back to the module-level eval fit — the
    steepest measured slope, so the fallback is conservative."""
    layers = cfg.model.layers
    caps = _normalize_caps(ghost_cap, len(layers))
    own = sum(l.n_centers / n_devices for l in layers)
    ghosts = sum(2 * (caps[i] or max(8, l.n_centers // n_devices))
                 for i, l in enumerate(layers))
    fixed, coeff = GHOST_TAX_FIXED, GHOST_TAX_COEFF
    anchor = MEASURED_GHOST_TAX.get((cfg.name, "train" if train else "eval"))
    if anchor is not None and \
            measurement_fingerprint(cfg) == anchor["fingerprint"]:
        fixed, coeff = anchor["fixed"], anchor["coeff"]
    return fixed + coeff * ghosts / max(own, 1.0)


def _tier2_stage_ms(cfg: Config) -> tuple:
    """(dense_ms, replicated_ms) — projected per-stage times under the
    design's own cost model: row/channel byte volumes over the HBM floor
    (the pipeline is bandwidth-bound BY DESIGN, design.md §11 addendum 3)
    plus the flash-kNN MXU term at its algorithmic 12.5%-of-peak floor
    (§11 addendum 2). Crude in absolute terms; used only for the tier-2
    dense/replicated SPLIT, and validated against real-chip stage timings
    (scripts/study_tier2_compute.py, design.md §13 addendum 2).

    Tier-2 placement (parallel/resident.py): DENSE = encoder layer 0, the
    final decode stage, the head — sharded ÷D. REPLICATED = encoder
    layers 1.., decode stages 0..n-2 — duplicated on every shard.
    """
    from gridgcn_tpu.utils.hw import V5E_HBM_BYTES_PER_S, V5E_PEAK_FLOPS

    HBM = V5E_HBM_BYTES_PER_S
    MXU_KNN = V5E_PEAK_FLOPS * 0.125  # flash-kNN's algorithmic MXU ceiling
    dt = _feat_dtype_bytes(cfg)
    layers, ups = cfg.model.layers, cfg.model.up_layers
    N = cfg.data.num_points
    BUILD_B = 16             # per-input-row voxel build: 8 B key, ~2 passes

    def enc_ms(n_in, c_in, l):
        M, K = l.n_centers, l.k_neighbors
        byts = (n_in * BUILD_B                       # voxel table build
                + M * K * (3 * 4 + c_in * dt)        # neighbor gather
                + M * K * sum(l.mlp) * dt * 2        # edge-MLP acts (r+w)
                + M * (l.context_channels + l.mlp[-1]) * dt * 2)
        return byts / HBM * 1e3

    def dec_ms(n_tgt, n_src, c_src, up, c_skip):
        knn = n_tgt * n_src * 2 * 16 / MXU_KNN * 1e3     # rank-16 contraction
        byts = (n_tgt * 3 * c_src * dt                   # 3-NN gather
                + n_tgt * (c_src + c_skip + sum(up.mlp) * 2) * dt)
        return knn + byts / HBM * 1e3

    c_in0 = (3 if cfg.model.use_xyz_feature else 0) + cfg.model.in_channels
    sizes = [N] + [l.n_centers for l in layers]
    widths = [c_in0] + [l.mlp[-1] for l in layers]

    dense = enc_ms(N, c_in0, layers[0])
    repl = 0.0
    for i in range(1, len(layers)):
        repl += enc_ms(sizes[i], widths[i], layers[i])
    for s, up in enumerate(ups):
        j = len(layers) - 1 - s                 # decode stage s targets j
        c_src = widths[j + 1] if s == 0 else ups[s - 1].mlp[-1]
        t = dec_ms(sizes[j], sizes[j + 1], c_src, up, widths[j])
        if s == len(ups) - 1:
            dense += t                          # final stage: sharded
        else:
            repl += t
    head_w = sum(cfg.model.head) + cfg.model.num_classes
    # seg heads run per-POINT (N rows); cls heads run on the globally
    # pooled feature — batch_size rows, not N (ADVICE r4 #4: charging the
    # cls head N-per-point made the cls fallback fraction meaningless)
    head_rows = N if cfg.model.task == "seg" else cfg.data.batch_size
    dense += head_rows * head_w * dt * 2 / HBM * 1e3
    return dense, repl


def tier2_replicated_fraction(cfg: Config, anchored: bool = True) -> float:
    """Fraction of the single-chip forward that tier 2 DUPLICATES on every
    shard (the replicated coarse pyramid). With `anchored` (default) the
    real-chip measurement is returned when one exists for this config
    (MEASURED_TIER2_REPL_FRAC, keyed by preset name); the raw byte model
    is the fallback — and the only thing returned with `anchored=False`
    (what scripts/study_tier2_compute.py validates against, design.md §13
    addendum 2)."""
    anchor = MEASURED_TIER2_REPL_FRAC.get(cfg.name)
    if anchored and anchor is not None:
        if measurement_fingerprint(cfg) == anchor["fingerprint"]:
            return anchor["frac"]
        warnings.warn(
            f"config '{cfg.name}' does not structurally match the preset "
            f"the tier-2 replicated fraction was measured on; using the "
            f"raw byte model (±40% error band) instead of the stale anchor",
            stacklevel=2)
    dense, repl = _tier2_stage_ms(cfg)
    return repl / max(dense + repl, 1e-12)


def _param_bytes(cfg: Config) -> int:
    """Total parameter bytes (shape-only; no device compute)."""
    from gridgcn_tpu.models.build import build_model

    model = build_model(cfg.model)
    B, N = 2, max(cfg.data.num_points, 64)

    def init():
        return model.init(
            {"params": jax.random.PRNGKey(0),
             "cagq": jax.random.PRNGKey(1)},
            jax.numpy.zeros((B, N, 3)),
            None, jax.numpy.ones((B, N), bool), False)

    shapes = jax.eval_shape(init)
    return int(sum(np.prod(l.shape) * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(shapes)))


def _feat_dtype_bytes(cfg: Config) -> int:
    return jax.numpy.dtype(cfg.model.dtype).itemsize


def comm_report(cfg: Config, n_devices: int,
                ghost_cap=0,
                compute_ms_per_step: Optional[float] = None,
                train_ms_per_step: Optional[float] = None) -> dict:
    """Per-step ICI byte/time accounting for every protocol in the
    framework at `n_devices` shards. `compute_ms_per_step` (e.g. measured
    single-chip busy time / D) turns volumes into a projected scaling
    efficiency. Tier-3 efficiency charges the GHOST-COMPUTE TAX the
    protocol's static ghost buffers cost (VERDICT r3 weak #2):
    useful_compute / (useful_compute × (1 + tax) + comm) — the r3 report
    omitted the tax its own mesh=1 study had measured at +31%. Tier-2
    efficiency symmetrically charges the REPLICATED coarse pyramid
    (per-shard = dense/D + replicated + all_gather;
    `tier2_replicated_fraction`, validated on hardware by
    scripts/study_tier2_compute.py) — pricing tier 2's duplication while
    charging tier 3's ghosts would rig the comparison.
    `ghost_cap`: int for all levels or a per-level sequence (pass
    `resident_ml.calibrate_ghost_cap(...)` output to project the
    calibrated configuration). `train_ms_per_step` (per-shard share of the
    measured single-chip TRAIN busy time) prices the training projection
    separately from inference — the two surfaces have different
    single-chip anchors (MEASURED_BUSY_MS); without it the train row
    reuses `compute_ms_per_step`."""
    D = n_devices
    dt = _feat_dtype_bytes(cfg)
    layers = cfg.model.layers
    ups = cfg.model.up_layers
    caps = _normalize_caps(ghost_cap, len(layers))

    # ---- DP gradient psum (training, all strategies) ----
    pbytes = _param_bytes(cfg)
    grad_psum = 2 * (D - 1) / D * pbytes         # ring reduce-scatter+AG
    report = {
        "n_devices": D,
        "param_bytes": pbytes,
        "dp": {
            "grad_psum_bytes": int(grad_psum),
            "time_ms": grad_psum / ICI_BYTES_PER_S * 1e3,
        },
    }

    # ---- tier 2: one all_gather of the layer-1 level ----
    m1 = layers[0].n_centers
    c1 = layers[0].mlp[-1]
    row = 3 * 4 + c1 * dt + 1
    # ring all_gather: each chip RECEIVES the other D-1 shares, i.e.
    # (D-1)/D of the assembled level — not the 2x psum factor (ADVICE r3 #3)
    ag_bytes = (D - 1) / D * m1 * row
    report["tier2"] = {
        "all_gather_rows": m1,
        "row_bytes": row,
        "bytes_per_chip": int(ag_bytes),
        "time_ms": ag_bytes / ICI_BYTES_PER_S * 1e3,
    }

    # ---- tier 3: per-level halo ppermutes ----
    per_level = []
    total_dir_bytes = 0.0                        # per direction (concurrent)
    for i, l in enumerate(layers):
        if l.n_centers % D:
            raise ValueError(f"layers[{i}].n_centers % {D} != 0")
        H = caps[i] or max(8, l.n_centers // D)
        c_i = l.mlp[-1]
        enc = H * (3 * 4 + c_i * dt + 1)         # exchange_boundary, per dir
        # decode stage s updates level len(layers)-2-s, so level i is
        # refreshed by stage len(layers)-2-i with that stage's up-MLP
        # width; the DEEPEST level is the decoder's input and is never
        # refreshed (ADVICE r3 #2)
        stage = len(layers) - 2 - i              # decode stage index
        if i == len(layers) - 1 or not (0 <= stage < len(ups)):
            ref = 0.0                            # no refresh for this level
        else:
            ref = H * ups[stage].mlp[-1] * dt    # refresh_ghosts, per dir
        per_level.append({
            "level": i, "H": H, "enc_bytes_per_dir": int(enc),
            "refresh_bytes_per_dir": int(ref),
        })
        total_dir_bytes += enc + ref
    tax = ghost_compute_tax(cfg, D, ghost_cap)
    tax_train = ghost_compute_tax(cfg, D, ghost_cap, train=True)
    report["tier3"] = {
        "levels": per_level,
        "bytes_per_dir_per_chip": int(total_dir_bytes),
        "time_ms": total_dir_bytes / ICI_BYTES_PER_S * 1e3,
        "ghost_compute_tax": tax,
        "ghost_compute_tax_train": tax_train,
        "train_tax_is_measured": (
            (a := MEASURED_GHOST_TAX.get((cfg.name, "train"))) is not None
            and measurement_fingerprint(cfg) == a["fingerprint"]),
    }

    # ---- projection ----
    repl_frac = tier2_replicated_fraction(cfg)
    report["tier2"]["replicated_frac"] = repl_frac
    if compute_ms_per_step is not None:
        t3 = report["tier3"]["time_ms"]
        # tier 2 duplicates the coarse pyramid on every shard — the exact
        # analog of tier 3's ghost-compute tax, charged the same way
        # (per-shard = dense/D + replicated + all_gather). The caller
        # passes the IDEAL per-shard share (single-chip compute / D).
        c_total = compute_ms_per_step * D
        t2_shard = ((1 - repl_frac) * compute_ms_per_step
                    + repl_frac * c_total + report["tier2"]["time_ms"])
        tr = (train_ms_per_step if train_ms_per_step is not None
              else compute_ms_per_step)
        report["projection"] = {
            "compute_ms_per_shard": compute_ms_per_step,
            "train_ms_per_shard": tr,
            # tier 3 pays its halo bytes AND the ghost-compute tax; the
            # efficiency is useful work over total time
            "tier3_inference_efficiency":
                compute_ms_per_step / (compute_ms_per_step * (1 + tax)
                                       + t3),
            "tier3_train_efficiency":
                tr / (tr * (1 + tax_train) + t3 + report["dp"]["time_ms"]),
            "tier2_inference_efficiency":
                compute_ms_per_step / t2_shard,
        }
    return report


def print_comm_report(cfg: Config, n_devices: int,
                      compute_ms_per_step: Optional[float] = None,
                      ghost_cap=0,
                      train_ms_per_step: Optional[float] = None,
                      label: Optional[str] = None) -> dict:
    rep = comm_report(cfg, n_devices, ghost_cap=ghost_cap,
                      compute_ms_per_step=compute_ms_per_step,
                      train_ms_per_step=train_ms_per_step)
    if label is not None:
        rep = {"ghost_cap_setting": label, **rep}
    print("COMM_REPORT " + json.dumps(rep))
    return rep

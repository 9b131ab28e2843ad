"""AOT model export for serving: freeze the jitted forward to StableHLO.

`jax.export` serializes the compiled forward — program AND weights (baked
in as constants) — into one portable artifact, so a serving process can
run inference without the model-building code, the checkpoint directory,
or even this package. This is the TPU-native analog of the reference's
deployable frozen artifact (an MXNet symbol + `.params` pair, SURVEY §2.3
F-15): one file, fixed input signature, zero Python model code at load
time.

    python -m gridgcn_tpu.export --ckpt-dir checkpoints/run --out model.shlo
    # serving side:
    from gridgcn_tpu.export import load_exported
    predict = load_exported("model.shlo")
    logits = predict(points)          # [B,N,3] -> [B,C] / [B,N,C]

Scope: single-device serving artifacts (the mesh/resident tiers stay in
the live `api.Predictor`, which needs the partitioner anyway). The export
is pinned to the platform it was lowered for (`meta["platforms"]`) — lower
on the serving hardware or pass --platform.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np


def export_predictor(ckpt_dir: str, out_path: str,
                     batch_size: Optional[int] = None,
                     num_points: Optional[int] = None,
                     step: Optional[int] = None,
                     platform: Optional[str] = None) -> dict:
    """Freeze the checkpoint's forward at a fixed [B, N] signature.

    Writes `out_path` (serialized jax.export artifact) and
    `out_path + '.json'` (config + signature metadata). Returns the meta
    dict. The exported callable's signature is (xyz [B,N,3], feat
    [B,N,Cin] if the model takes features, mask [B,N] bool, key [2] u32).
    """
    import jax
    from jax import export as jexport

    from gridgcn_tpu.api import Predictor

    p = Predictor(ckpt_dir, step=step)
    cfg = p.cfg
    B = batch_size or cfg.data.eval_batch_size
    N = num_points or cfg.data.num_points
    Cin = cfg.model.in_channels

    if Cin > 0:
        fwd = p._fwd
    else:
        # drop the unused feat slot so the artifact's signature is honest
        def fwd(x, m, k):
            return p._fwd(x, None, m, k)

    args = [jax.ShapeDtypeStruct((B, N, 3), jax.numpy.float32)]
    if Cin > 0:
        args.append(jax.ShapeDtypeStruct((B, N, Cin), jax.numpy.float32))
    args.append(jax.ShapeDtypeStruct((B, N), jax.numpy.bool_))
    args.append(jax.ShapeDtypeStruct((2,), jax.numpy.uint32))

    platforms = (platform,) if platform else None
    exp = jexport.export(jax.jit(fwd), platforms=platforms)(*args)
    blob = exp.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)

    from gridgcn_tpu.configs.base import to_json
    meta = {
        "format": "gridgcn-tpu-export-v1",
        "config": json.loads(to_json(cfg)),
        "task": cfg.model.task,
        "num_classes": cfg.model.num_classes,
        "batch_size": B,
        "num_points": N,
        "in_channels": Cin,
        "step": p.step,
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "bytes": len(blob),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedPredictor:
    """Serving-side wrapper: pads any batch [B'<=B, N'<=N] to the exported
    signature (padding masked off), trims the logits back."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(path, "rb") as f:
            self._exp = jexport.deserialize(f.read())
        with open(path + ".json") as f:
            self.meta = json.load(f)
        self.task = self.meta["task"]
        self.B = self.meta["batch_size"]
        self.N = self.meta["num_points"]
        self.Cin = self.meta["in_channels"]

    def __call__(self, xyz, feat=None, mask=None, rng=None,
                 votes: int = 1):
        """`votes` > 1 logit-averages that many CAGQ seeds (the whole-scene
        voting protocol) — the padded input is staged once."""
        import jax
        import jax.numpy as jnp

        if votes < 1:
            raise ValueError(f"votes must be >= 1, got {votes}")

        xyz = np.asarray(xyz, np.float32)
        squeeze = xyz.ndim == 2
        if squeeze:
            xyz = xyz[None]
            if feat is not None:
                feat = np.asarray(feat, np.float32)[None]
            if mask is not None:
                mask = np.asarray(mask, bool)[None]
        Bq, Nq = xyz.shape[:2]
        if Bq > self.B or Nq > self.N:
            raise ValueError(
                f"input [{Bq},{Nq}] exceeds the exported signature "
                f"[{self.B},{self.N}]; re-export with larger capacity")
        if (self.Cin > 0) != (feat is not None):
            raise ValueError(
                f"exported model takes in_channels={self.Cin}; got "
                f"feat={'present' if feat is not None else 'none'}")
        if mask is None:
            mask = np.ones((Bq, Nq), bool)

        pb, pn = self.B - Bq, self.N - Nq
        x = np.zeros((self.B, self.N, 3), np.float32)
        x[:Bq, :Nq] = xyz
        m = np.zeros((self.B, self.N), bool)
        m[:Bq, :Nq] = mask
        call_args = [jnp.asarray(x)]
        if self.Cin > 0:
            fx = np.zeros((self.B, self.N, self.Cin), np.float32)
            fx[:Bq, :Nq] = feat
            call_args.append(jnp.asarray(fx))
        call_args.append(jnp.asarray(m))
        key = rng if rng is not None else jax.random.PRNGKey(0)
        key = jnp.asarray(key, jnp.uint32)

        acc = None
        for v in range(votes):
            k = jax.random.fold_in(key, v) if votes > 1 else key
            lg = self._exp.call(*call_args, jnp.asarray(k, jnp.uint32))
            acc = lg if acc is None else acc + lg
        out = np.asarray(acc) / votes
        out = out[:Bq, :Nq] if self.task == "seg" else out[:Bq]
        return out[0] if squeeze else out


def load_exported(path: str) -> ExportedPredictor:
    return ExportedPredictor(path)


def main(argv=None):
    import argparse

    from gridgcn_tpu.utils.platform import force_platform_from_env

    force_platform_from_env()
    ap = argparse.ArgumentParser(
        description="Freeze a checkpoint's forward into a serving artifact")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="lowering platform (default: current backend)")
    args = ap.parse_args(argv)
    meta = export_predictor(args.ckpt_dir, args.out,
                            batch_size=args.batch_size,
                            num_points=args.num_points,
                            step=args.step, platform=args.platform)
    print(json.dumps({k: meta[k] for k in
                      ("task", "batch_size", "num_points", "step",
                       "platforms", "bytes")}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

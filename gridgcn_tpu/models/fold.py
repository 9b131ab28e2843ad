"""Inference-time BatchNorm folding (VERDICT r2 item 1c).

At inference a BatchNorm is the per-channel affine
    y = (x - mean) * scale / sqrt(var + eps) + bias
applied right after a Dense. On TPU these affines do NOT reliably fuse
into the matmul epilogue — traces of the whole-scene forward show them
materialized as separate activation-shaped fusions (~0.3 ms/scene, e.g.
`fusion.143 = bf16[2048,128]` built from the f32 scale/var vectors). The
reference's MXNet stack pays the same cost as standalone BatchNorm ops
(SURVEY §1 L1).

`fold_batchnorm` rewrites the params so the Dense absorbs the affine:
    W' = W * g,   b' = (b - mean) * g + bias,   g = scale / sqrt(var+eps)
and the model skips BN entirely via `ModelConfig.fold_bn` (the naming
convention `<stem>_dense<i>` / `<stem>_bn<i>` pairs them; GCA._mlp,
classifier/segmentation heads, segmentation up-MLPs all follow it).

`fold_inference` additionally pre-casts the folded Dense params to the
model's compute dtype (bf16 presets otherwise re-cast the f32 weights
on every forward call) and returns the matching fold_bn=True config.
Inference only — never fold a model that will keep training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax.numpy as jnp

# flax.linen.BatchNorm default epsilon (all models use the default)
BN_EPS = 1e-5


def _fold_tree(params: Dict[str, Any], stats: Dict[str, Any],
               count: list) -> Dict[str, Any]:
    out = {}
    for key, val in params.items():
        if not isinstance(val, dict):
            out[key] = val
            continue
        if "_bn" in key:
            continue    # consumed below by its paired dense (or orphaned)
        if "_dense" in key and "kernel" in val:
            bn_key = key.replace("_dense", "_bn")
            bn_p = params.get(bn_key)
            bn_s = stats.get(bn_key) if isinstance(stats, dict) else None
            if bn_p is not None and bn_s is not None:
                g = (bn_p["scale"]
                     / jnp.sqrt(bn_s["var"].astype(jnp.float32) + BN_EPS))
                kernel = val["kernel"].astype(jnp.float32) * g
                bias = val.get("bias", 0.0)
                bias = ((jnp.asarray(bias, jnp.float32) - bn_s["mean"]) * g
                        + bn_p["bias"])
                out[key] = {**val, "kernel": kernel, "bias": bias}
                count[0] += 1
                continue
        out[key] = _fold_tree(val, stats.get(key, {})
                              if isinstance(stats, dict) else {}, count)
    return out


def fold_batchnorm(variables: Dict[str, Any]) -> Tuple[Dict[str, Any], int]:
    """Fold every `<stem>_bn<i>` into its `<stem>_dense<i>` sibling.

    Returns (variables', n_folded): params with BN entries removed and
    Dense kernels/biases rewritten; the batch_stats collection is dropped
    (a fold_bn=True model never reads it). Orphan BN entries (no paired
    dense) would be silently dropped — the assert guards against that.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    n_bn = len([None for _ in _iter_bn(params)])
    count = [0]
    folded = _fold_tree(params, stats, count)
    if count[0] != n_bn:
        raise ValueError(
            f"found {n_bn} BatchNorms but folded {count[0]} — a BN without "
            "a '<stem>_dense<i>' sibling cannot be folded")
    extra = {k: v for k, v in variables.items()
             if k not in ("params", "batch_stats")}
    return {"params": folded, **extra}, count[0]


def _iter_bn(tree, path=()):
    for key, val in tree.items():
        if isinstance(val, dict):
            if "_bn" in key and ("scale" in val or "mean" in val):
                yield path + (key,)
            else:
                yield from _iter_bn(val, path + (key,))


def _cast_dense(tree: Dict[str, Any], dtype, skip=("logits",)):
    out = {}
    for key, val in tree.items():
        if key in skip:
            out[key] = val
        elif isinstance(val, dict):
            if "kernel" in val:
                out[key] = {k: (v.astype(dtype)
                                if k in ("kernel", "bias") else v)
                            for k, v in val.items()}
            else:
                out[key] = _cast_dense(val, dtype, skip)
        else:
            out[key] = val
    return out


def fold_inference(cfg, variables):
    """(Config, trained variables) → (fold_bn=True Config, folded variables).

    For bf16 presets the folded Dense params are pre-cast to bf16 so the
    per-forward f32→bf16 weight casts disappear too ('logits' stays f32 —
    its Dense computes in f32 by design). Inference only.
    """
    model_cfg = cfg.model if hasattr(cfg, "model") else cfg
    folded, n = fold_batchnorm(variables)
    # eval_dtype lets f32-trained presets serve in bf16 (VERDICT r2 #8)
    dtype_str = model_cfg.eval_dtype or model_cfg.dtype
    dtype = jnp.dtype(dtype_str)
    if dtype == jnp.bfloat16:
        folded = {**folded, "params": _cast_dense(folded["params"], dtype)}
    new_model = dataclasses.replace(model_cfg, fold_bn=True, dtype=dtype_str)
    if hasattr(cfg, "model"):
        return dataclasses.replace(cfg, model=new_model), folded
    return new_model, folded

"""Model factory: ModelConfig → flax module (+ init/apply helpers)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gridgcn_tpu.configs.base import Config, ModelConfig
from gridgcn_tpu.models.classifier import GridGCNClassifier
from gridgcn_tpu.models.segmentation import GridGCNSegmentation


def build_model(cfg: ModelConfig) -> nn.Module:
    if cfg.task == "cls":
        return GridGCNClassifier(cfg)
    if cfg.task == "seg":
        return GridGCNSegmentation(cfg)
    raise ValueError(f"unknown task: {cfg.task}")


def example_inputs(cfg: Config, batch_size: int | None = None):
    """Deterministic dummy inputs matching a config's input spec."""
    B = batch_size or cfg.data.batch_size
    N = cfg.data.num_points
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (B, N, 3), minval=-1.0, maxval=1.0)
    feat = None
    if cfg.model.in_channels > 0:
        feat = jax.random.uniform(key, (B, N, cfg.model.in_channels))
    mask = jnp.ones((B, N), bool)
    return xyz, feat, mask


def init_model(cfg: Config, seed: int = 0):
    """Initialize (model, variables) for a config on dummy inputs.

    init is jitted: eager op-by-op dispatch is pathologically slow on
    remote-tunnel TPU backends (hundreds of seconds for even a tiny model)."""
    model = build_model(cfg.model)
    xyz, feat, mask = example_inputs(cfg, batch_size=2)
    key = jax.random.PRNGKey(seed)
    k_param, k_cagq, k_drop = jax.random.split(key, 3)
    rngs = {"params": k_param, "cagq": k_cagq, "dropout": k_drop}
    if feat is None:
        init_fn = jax.jit(lambda r, x, m: model.init(r, x, None, m,
                                                     train=False))
        variables = init_fn(rngs, xyz, mask)
    else:
        init_fn = jax.jit(lambda r, x, f, m: model.init(r, x, f, m,
                                                        train=False))
        variables = init_fn(rngs, xyz, feat, mask)
    return model, variables

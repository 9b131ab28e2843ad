"""Checkpoint / resume via orbax (SURVEY.md §5 'Checkpoint / resume').

The reference saves MXNet `prefix-NNNN.params` per epoch and resumes via a
`--load-epoch` flag. Here: orbax CheckpointManager with keep-last-k, saving
the full train state (params + batch_stats + optimizer state + step), the
PRNG key, and the serialized config so a checkpoint is self-describing.
Restore-latest on start gives crash recovery (SURVEY §5 'Failure detection').
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from gridgcn_tpu.configs.base import Config, from_json, to_json


class CheckpointManager:
    def __init__(self, directory: str, cfg: Config, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.cfg = cfg
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True),
        )
        cfg_path = os.path.join(self.directory, "config.json")
        if os.path.exists(cfg_path):
            # a checkpoint dir is bound to ONE config: a silent mismatch
            # would resume/serve the old weights under new hyperparameters
            # (or die later in from_state_dict with a bare shape error)
            with open(cfg_path) as f:
                existing = f.read()
            # compare through the CURRENT schema (parse + re-serialize),
            # not raw strings: a checkpoint written before a config field
            # was added (new fields always get defaults) must keep loading
            # — raw-string equality bricked every old ckpt on any additive
            # schema change
            from gridgcn_tpu.configs.base import from_json
            if to_json(from_json(existing)) != to_json(cfg):
                raise ValueError(
                    f"{cfg_path} was written by a different config; "
                    f"pick a fresh ckpt_dir for a new configuration "
                    f"(or delete the directory to restart)")
        else:
            with open(cfg_path, "w") as f:
                f.write(to_json(cfg))

    def save(self, step: int, state: Any, rng: jax.Array | None = None):
        payload = {"state": state}
        if rng is not None:
            payload["rng"] = rng
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, rng_template: jax.Array | None = None,
                step: int | None = None):
        """Restore {'state': ..., 'rng'?: ...} at `step` (default latest);
        None if no checkpoint exists. Restores the raw on-disk tree and maps
        it onto the template with flax serialization, so payloads with or
        without an rng entry both work."""
        from flax import serialization

        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        raw = self._mgr.restore(step)

        def listify(x):
            # flax state dicts index sequences as {'0': ..}; orbax restores
            # real lists — normalize before from_state_dict
            if isinstance(x, (list, tuple)):
                return {str(i): listify(v) for i, v in enumerate(x)}
            if isinstance(x, dict):
                return {k: listify(v) for k, v in x.items()}
            return x

        out = {"state": serialization.from_state_dict(
            state_template, listify(raw["state"]))}
        if "rng" in raw and raw["rng"] is not None:
            rng = jnp.asarray(raw["rng"])
            out["rng"] = (rng.astype(jnp.uint32)
                          if rng.dtype != jnp.uint32 else rng)
        return out

    @staticmethod
    def load_config(directory: str) -> Config:
        with open(os.path.join(os.path.abspath(directory), "config.json")) as f:
            return from_json(f.read())

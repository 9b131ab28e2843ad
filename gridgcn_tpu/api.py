"""Serving API: load a trained checkpoint into a jitted predictor.

The reference's inference entry points are its per-task test scripts
(SURVEY §3.5); this module is the library equivalent for production use:

    from gridgcn_tpu.api import load_predictor
    predict = load_predictor("checkpoints")
    logits = predict(points)            # [N,3] or [B,N,3] numpy/jax array

One compilation per input shape; per-point tasks return [.., N, C] logits,
classification returns [.., C].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gridgcn_tpu.models.build import init_model
from gridgcn_tpu.train.steps import create_train_state
from gridgcn_tpu.utils.checkpoint import CheckpointManager


class Predictor:
    def __init__(self, ckpt_dir: str, step: Optional[int] = None,
                 mesh=None):
        """mesh: None (single device), an int (data-parallel serving over
        that many devices), or a jax.sharding.Mesh — batches shard across
        the mesh, parameters replicate (F-19 applied to inference)."""
        self.cfg = CheckpointManager.load_config(ckpt_dir)
        model, variables = init_model(self.cfg, seed=0)
        state = create_train_state(self.cfg, model, variables, 1)
        mgr = CheckpointManager(ckpt_dir, self.cfg,
                                keep=self.cfg.train.keep_ckpts)
        restored = mgr.restore(state, step=step)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        state = restored["state"]
        self.step = int(state.step)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        # serving protocol = bench protocol: BN folded into Dense weights,
        # params pre-cast to the preset's inference dtype (eval_dtype lets
        # f32-trained presets serve bf16 — models/fold.py). Applies to the
        # batch forward, the spatial scene tiers, and the AOT export alike.
        from gridgcn_tpu.models.build import build_model
        from gridgcn_tpu.models.fold import fold_inference
        self.cfg, variables = fold_inference(self.cfg, variables)
        model = build_model(self.cfg.model)
        self._model = model

        self._mesh = None
        self._n_shards = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gridgcn_tpu.parallel.mesh import DATA_AXIS, make_mesh
            self._mesh = make_mesh(mesh) if isinstance(mesh, int) else mesh
            self._n_shards = int(np.prod(
                [self._mesh.shape[a] for a in self._mesh.axis_names]))
            self._batch_sh = NamedSharding(self._mesh, P(DATA_AXIS))
            variables = jax.device_put(
                variables, NamedSharding(self._mesh, P()))
        self._fwd = jax.jit(
            lambda x, f, m, k: model.apply(
                variables, x, f, m, train=False, rngs={"cagq": k}))
        self._variables = variables
        self._scene_fwds = {}      # per spatial tier, built lazily

    def __call__(self, xyz, feat=None, mask=None,
                 rng: Optional[jax.Array] = None):
        """xyz [N,3] or [B,N,3] → logits ([C] / [N,C] per cloud)."""
        xyz = jnp.asarray(xyz, jnp.float32)
        squeeze = xyz.ndim == 2
        if squeeze:
            xyz = xyz[None]
            if feat is not None:
                feat = jnp.asarray(feat)[None]
            if mask is not None:
                mask = jnp.asarray(mask)[None]
        if mask is None:
            mask = jnp.ones(xyz.shape[:2], bool)
        if feat is not None:
            feat = jnp.asarray(feat, jnp.float32)
        key = rng if rng is not None else jax.random.PRNGKey(0)

        B = xyz.shape[0]
        pad = (-B) % self._n_shards       # mesh serving: pad to shard count
        if pad:
            xyz = jnp.concatenate([xyz, jnp.zeros((pad, *xyz.shape[1:]),
                                                  xyz.dtype)])
            mask = jnp.concatenate([mask, jnp.zeros((pad, mask.shape[1]),
                                                    bool)])
            if feat is not None:
                feat = jnp.concatenate(
                    [feat, jnp.zeros((pad, *feat.shape[1:]), feat.dtype)])
        if self._mesh is not None:
            xyz = jax.device_put(xyz, self._batch_sh)
            mask = jax.device_put(mask, self._batch_sh)
            if feat is not None:
                feat = jax.device_put(feat, self._batch_sh)
        logits = self._fwd(xyz, feat, mask, key)
        out = np.asarray(logits)[:B]
        return out[0] if squeeze else out

    def predict_classes(self, xyz, feat=None, mask=None):
        return np.argmax(self(xyz, feat, mask), axis=-1)

    def predict_scene(self, xyz, feat=None, *, votes: int = 1,
                      spatial: str = "auto",
                      rng: Optional[jax.Array] = None):
        """Whole-scene per-point logits for ONE scene [N, 3] (seg models).

        `feat` is positional-or-keyword (second, matching `__call__` /
        `predict_classes`); everything after it is KEYWORD-ONLY so a
        pre-`feat` caller that passed `votes` positionally fails with a
        clear TypeError instead of silently binding votes to feat
        (ADVICE r4 #2 — this was a positional-API break in round 4).

        With a mesh, scenes are spatially sharded across it via the
        fully-resident tier (F-22: `spatial='resident'|'resident_ml'`;
        'auto' = resident_ml when every layer's center count divides the
        shard count, else resident); without a mesh the scene runs on one
        device. `feat` [N, in_channels] is required when the checkpoint's
        config has in_channels > 0 (e.g. the S3DIS preset's 6 rgb/norm-xyz
        channels) and rides the spatial partition with xyz. `votes` CAGQ
        seeds are logit-averaged (the reference's whole-scene voting
        protocol)."""
        if self.cfg.model.task != "seg":
            raise ValueError("predict_scene is for segmentation models")
        if votes < 1:
            raise ValueError(f"votes must be >= 1, got {votes}")
        spatial = spatial.replace("-", "_")   # accept the CLI spelling
        if spatial not in ("auto", "resident", "resident_ml"):
            raise ValueError(f"unknown spatial tier {spatial!r}; expected "
                             "'auto', 'resident', or 'resident_ml'")
        xyz = np.asarray(xyz, np.float32)
        C_in = self.cfg.model.in_channels
        if C_in and feat is None:
            raise ValueError(f"this checkpoint's config has in_channels="
                             f"{C_in}: predict_scene needs feat [N, {C_in}]")
        if feat is not None:
            feat = np.asarray(feat, np.float32)
            if feat.shape != (xyz.shape[0], C_in):
                raise ValueError(f"feat shape {feat.shape} != expected "
                                 f"{(xyz.shape[0], C_in)}")
        mask = np.ones(xyz.shape[0], bool)
        rng = jax.random.PRNGKey(0) if rng is None else rng

        if self._mesh is None:
            acc = None
            for v in range(votes):
                lg = self(xyz, feat, rng=jax.random.fold_in(rng, v))
                acc = lg if acc is None else acc + lg
            return acc / votes

        D = self._n_shards
        if spatial == "auto":
            divides = all(l.n_centers % D == 0
                          for l in self.cfg.model.layers)
            spatial = "resident_ml" if divides else "resident"
        if spatial == "resident_ml":
            from gridgcn_tpu.parallel.resident_ml import (
                make_resident_ml_forward, resident_ml_seg_predict)
            if spatial not in self._scene_fwds:
                self._scene_fwds[spatial] = make_resident_ml_forward(
                    self.cfg, self._mesh)
            predict = resident_ml_seg_predict
        else:
            from gridgcn_tpu.parallel.resident import (
                make_resident_forward, resident_seg_predict)
            if spatial not in self._scene_fwds:
                self._scene_fwds[spatial] = make_resident_forward(
                    self.cfg, self._mesh)
            predict = resident_seg_predict
        # capacity auto-sizes to the scene's max slab+halo occupancy (~N/D
        # per shard, not N — staging the whole scene on every shard would
        # defeat the memory point of resident sharding)
        return predict(self.cfg, self._variables, xyz, mask, self._mesh,
                       rng=rng, fwd=self._scene_fwds[spatial], votes=votes,
                       feat=feat)

    def predict_scenes(self, scenes_xyz, feats=None, *, votes: int = 1,
                       rng: Optional[jax.Array] = None):
        """Batched whole-scene logits [B, N, num_classes] for B scenes at
        once on a 2-D (scene × slab) mesh (F-19 ∘ F-22, round 5): the B
        scenes ride the data axis, each scene's voxel slabs ride its own
        spatial ring of mesh_size/B chips — the pod-scale serving shape.
        Requires a mesh Predictor whose size B divides; per-scene outputs
        equal the 1-D tier-3 path
        (test_spatial.test_scene_batched_tier3_matches_per_scene).
        `feats` [B, N, in_channels] is required when the checkpoint's
        config has in_channels > 0; `votes` CAGQ seeds are logit-averaged
        per scene."""
        if self.cfg.model.task != "seg":
            raise ValueError("predict_scenes is for segmentation models")
        if self._mesh is None:
            raise ValueError("predict_scenes needs a mesh Predictor "
                             "(Predictor(..., mesh=N))")
        if votes < 1:
            raise ValueError(f"votes must be >= 1, got {votes}")
        scenes_xyz = np.asarray(scenes_xyz, np.float32)
        if scenes_xyz.ndim != 3 or scenes_xyz.shape[-1] != 3:
            raise ValueError(f"scenes_xyz must be [B, N, 3], got "
                             f"{scenes_xyz.shape}")
        B = scenes_xyz.shape[0]
        D = self._n_shards
        if B < 1 or D % B:
            raise ValueError(f"scene count {B} must divide the mesh size "
                             f"{D}")
        Ds = D // B
        if any(l.n_centers % Ds for l in self.cfg.model.layers):
            raise ValueError(
                f"tier-3 scene batching needs every layer's n_centers "
                f"divisible by {Ds} spatial shards "
                f"({[l.n_centers for l in self.cfg.model.layers]})")
        C_in = self.cfg.model.in_channels
        if C_in:
            if feats is None:
                raise ValueError(f"this checkpoint's config has "
                                 f"in_channels={C_in}: predict_scenes "
                                 f"needs feats [B, N, {C_in}]")
            feats = np.asarray(feats, np.float32)
            if feats.shape != scenes_xyz.shape[:2] + (C_in,):
                raise ValueError(f"feats shape {feats.shape} != expected "
                                 f"{scenes_xyz.shape[:2] + (C_in,)}")

        from gridgcn_tpu.parallel.mesh import (
            DATA_AXIS, SPACE_AXIS, make_mesh2d)
        from gridgcn_tpu.parallel.resident_ml import (
            make_resident_ml_forward, resident_ml_seg_predict_scenes)

        key = ("scenes", B)
        if key not in self._scene_fwds:
            devs = list(self._mesh.devices.reshape(-1))
            mesh2d = make_mesh2d(B, Ds, devices=devs)
            self._scene_fwds[key] = (mesh2d, make_resident_ml_forward(
                self.cfg, mesh2d, axis_name=SPACE_AXIS,
                batch_axis=DATA_AXIS))
        mesh2d, fwd = self._scene_fwds[key]
        masks = np.ones(scenes_xyz.shape[:2], bool)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        acc = None
        for v in range(votes):
            k = jax.random.fold_in(rng, v) if votes > 1 else rng
            lg = resident_ml_seg_predict_scenes(
                self.cfg, self._variables, scenes_xyz, masks, mesh2d,
                feats=feats, rng=k, fwd=fwd)
            acc = lg if acc is None else acc + lg
        return acc / votes


def load_predictor(ckpt_dir: str, step: Optional[int] = None,
                   mesh=None) -> Predictor:
    """mesh=N serves data-parallel over N devices (params replicated)."""
    return Predictor(ckpt_dir, step=step, mesh=mesh)

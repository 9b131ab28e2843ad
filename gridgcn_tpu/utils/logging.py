"""Structured observability (SURVEY.md §5 'Metrics / logging'): per-step
metrics as JSONL to stdout + optional file, plus optional TensorBoard
scalars; replaces the reference's plain `logging` + MXNet metric
accumulators (reference: console/file logging only, SURVEY §5)."""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

import numpy as np


def _to_py(v):
    if hasattr(v, "item") and getattr(v, "size", 1) == 1:
        return v.item()
    if isinstance(v, (np.ndarray,)):
        return v.tolist()
    if hasattr(v, "tolist"):
        return v.tolist()
    return v


class MetricLogger:
    def __init__(self, path: Optional[str] = None, stream: IO = sys.stdout,
                 tensorboard_dir: Optional[str] = None):
        self.stream = stream
        self.file = open(path, "a") if path else None
        self.t0 = time.time()
        self.tb = None
        self._tb_step = 0
        if tensorboard_dir:
            # lazy + optional: tf is only touched when TB output is asked for
            import tensorflow as tf  # baked into this environment
            self.tb = tf.summary.create_file_writer(tensorboard_dir)
            self._tf = tf

    def log(self, kind: str, **metrics):
        rec = {"kind": kind, "t": round(time.time() - self.t0, 3)}
        rec.update({k: _to_py(v) for k, v in metrics.items()})
        line = json.dumps(rec)
        print(line, file=self.stream, flush=True)
        if self.file:
            self.file.write(line + "\n")
            self.file.flush()
        if self.tb is not None:
            step = rec.get("step")
            step = int(step) if isinstance(step, (int, float)) else self._tb_step
            self._tb_step = max(self._tb_step, step) + 1
            with self.tb.as_default():
                for k, v in rec.items():
                    if k not in ("kind", "step") and isinstance(
                            v, (int, float)) and not isinstance(v, bool):
                        self._tf.summary.scalar(f"{kind}/{k}", v, step=step)
            self.tb.flush()

    def close(self):
        if self.file:
            self.file.close()
        if self.tb is not None:
            self.tb.close()

"""Structured observability (SURVEY.md §5 'Metrics / logging'): per-step
metrics as JSONL to stdout + optional file; replaces the reference's plain
`logging` + MXNet metric accumulators."""

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
    def __init__(self, path: Optional[str] = None, stream: IO = sys.stdout):
        self.stream = stream
        self.file = open(path, "a") if path else None
        self.t0 = time.time()

    def log(self, kind: str, **metrics):
        rec = {"kind": kind, "t": round(time.time() - self.t0, 3)}
        rec.update({k: _to_py(v) for k, v in metrics.items()})
        line = json.dumps(rec)
        print(line, file=self.stream, flush=True)
        if self.file:
            self.file.write(line + "\n")
            self.file.flush()

    def close(self):
        if self.file:
            self.file.close()

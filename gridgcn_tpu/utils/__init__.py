from gridgcn_tpu.utils.checkpoint import CheckpointManager
from gridgcn_tpu.utils.logging import MetricLogger

__all__ = ["CheckpointManager", "MetricLogger"]

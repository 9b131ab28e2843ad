from gridgcn_tpu.configs.base import (
    GridLayerSpec,
    UpLayerSpec,
    ModelConfig,
    DataConfig,
    TrainConfig,
    Config,
)
from gridgcn_tpu.configs import presets

__all__ = [
    "GridLayerSpec",
    "UpLayerSpec",
    "ModelConfig",
    "DataConfig",
    "TrainConfig",
    "Config",
    "presets",
]

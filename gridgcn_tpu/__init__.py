"""gridgcn_tpu — a TPU-native point-cloud learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Grid-GCN
(Xharlie/Grid-GCN, arXiv:1912.02984): Coverage-Aware Grid Query (CAGQ) over
fixed-capacity voxel tables, Grid Context Aggregation (GCA), GridConv networks
for ModelNet40 classification and S3DIS/ScanNet segmentation, with on-device
preprocessing and multi-chip sharding via jax.sharding.

Design blueprint: /root/repo/SURVEY.md. The reference mount was empty (SURVEY
§0); parity is defined against the paper-derived oracle in tests/oracle/.
"""

__version__ = "0.1.0"

from gridgcn_tpu.configs import presets  # noqa: F401

_LAZY = {
    "load_predictor": ("gridgcn_tpu.api", "load_predictor"),
    "Predictor": ("gridgcn_tpu.api", "Predictor"),
    "load_exported": ("gridgcn_tpu.export", "load_exported"),
    "export_predictor": ("gridgcn_tpu.export", "export_predictor"),
}


def __getattr__(name):
    """Lazy top-level serving API (`gridgcn_tpu.load_predictor(...)`)
    without importing jax at package-import time."""
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'gridgcn_tpu' has no attribute {name!r}")

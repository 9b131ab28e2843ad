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

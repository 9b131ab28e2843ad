"""Pallas (Mosaic) TPU kernels — the native tier replacing the reference's
CUDA kernels (SURVEY.md §2.1). Each kernel has a pure-jnp oracle behind the
same signature; `interpret=True` runs kernels in Python for CPU testing."""

from gridgcn_tpu.ops.pallas.knn import flash_knn, flash_three_nn

__all__ = ["flash_knn", "flash_three_nn"]

from gridgcn_tpu.data.augment import augment_batch
from gridgcn_tpu.data.pipeline import make_dataset, Dataset

__all__ = ["augment_batch", "make_dataset", "Dataset"]

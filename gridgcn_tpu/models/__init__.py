from gridgcn_tpu.models.gca import GCA
from gridgcn_tpu.models.gridconv import GridConv, gather_point_features
from gridgcn_tpu.models.classifier import GridGCNClassifier
from gridgcn_tpu.models.segmentation import GridGCNSegmentation
from gridgcn_tpu.models.build import build_model

__all__ = [
    "GCA",
    "GridConv",
    "gather_point_features",
    "GridGCNClassifier",
    "GridGCNSegmentation",
    "build_model",
]

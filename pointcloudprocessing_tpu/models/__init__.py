from pointcloudprocessing_tpu.models.layers import PointwiseBlock, DenseBlock
from pointcloudprocessing_tpu.models.tnet import TNet
from pointcloudprocessing_tpu.models.pointnet import (
    PointNet,
    FreezeFlags,
    NOTHING_FROZEN,
    freeze_flags_from_trainable,
    layer_trainability,
)
from pointcloudprocessing_tpu.models.pointnet2 import PointNet2
from pointcloudprocessing_tpu.models.dgcnn import DGCNN
from pointcloudprocessing_tpu.models.classifier import PointNetClassifier, TNetRegressor
from pointcloudprocessing_tpu.models.pipeline import PointCloudPipeline

__all__ = [
    "PointwiseBlock",
    "DenseBlock",
    "TNet",
    "PointNet",
    "PointNet2",
    "DGCNN",
    "FreezeFlags",
    "NOTHING_FROZEN",
    "freeze_flags_from_trainable",
    "layer_trainability",
    "PointNetClassifier",
    "TNetRegressor",
    "PointCloudPipeline",
]

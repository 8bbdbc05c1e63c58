from pointcloudprocessing_tpu.ops import mat_ops
from pointcloudprocessing_tpu.ops.normalize import normalize_unit_sphere
from pointcloudprocessing_tpu.ops.resample import (
    adjust_to_input_width_np,
    adjust_to_input_width,
)
from pointcloudprocessing_tpu.ops.augment import jitter
from pointcloudprocessing_tpu.ops.voxel import voxel_downsample, voxel_downsample_batch
from pointcloudprocessing_tpu.ops.fps import (
    farthest_point_sample,
    farthest_point_sample_and_gather,
    stride_sample_and_gather,
    farthest_point_sample_batch,
)
from pointcloudprocessing_tpu.ops.knn import knn, knn_batch, group_points
from pointcloudprocessing_tpu.ops.normals import (
    estimate_normals,
    estimate_normals_batch,
)
from pointcloudprocessing_tpu.ops.hpr import (
    hidden_point_removal,
    hidden_point_removal_mask,
    spherical_flip,
)
from pointcloudprocessing_tpu.ops.icp import icp

__all__ = [
    "mat_ops",
    "normalize_unit_sphere",
    "adjust_to_input_width_np",
    "adjust_to_input_width",
    "jitter",
    "voxel_downsample",
    "voxel_downsample_batch",
    "farthest_point_sample",
    "farthest_point_sample_and_gather",
    "stride_sample_and_gather",
    "farthest_point_sample_batch",
    "knn",
    "knn_batch",
    "group_points",
    "estimate_normals",
    "estimate_normals_batch",
    "hidden_point_removal",
    "hidden_point_removal_mask",
    "spherical_flip",
    "icp",
]

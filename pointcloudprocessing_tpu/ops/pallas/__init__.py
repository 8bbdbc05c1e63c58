from pointcloudprocessing_tpu.ops.pallas.fps import (
    fps_pallas,
    fps_pallas_with_points,
)
from pointcloudprocessing_tpu.ops.pallas.voxel_reduce import segment_reduce_pallas

__all__ = ["fps_pallas", "fps_pallas_with_points", "segment_reduce_pallas"]

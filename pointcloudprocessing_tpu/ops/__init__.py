from pointcloudprocessing_tpu.ops import mat_ops
from pointcloudprocessing_tpu.ops.normalize import normalize_unit_sphere
from pointcloudprocessing_tpu.ops.resample import (
    adjust_to_input_width_np,
    adjust_to_input_width,
)
from pointcloudprocessing_tpu.ops.augment import jitter

__all__ = [
    "mat_ops",
    "normalize_unit_sphere",
    "adjust_to_input_width_np",
    "adjust_to_input_width",
    "jitter",
]

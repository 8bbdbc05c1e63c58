from pointcloudprocessing_tpu.toolkit.calibration import solve_kabsch
from pointcloudprocessing_tpu.toolkit.corner_reflector import (
    moller_trumbore,
    get_reflection,
)
from pointcloudprocessing_tpu.toolkit.optitrack import OptiTrack
from pointcloudprocessing_tpu.toolkit.provizio import Provizio, ROS
from pointcloudprocessing_tpu.toolkit.tqdm_capture import TQDMCapture
from pointcloudprocessing_tpu.toolkit import globals  # noqa: A004 (API parity)
from pointcloudprocessing_tpu.toolkit import mat_ops
from pointcloudprocessing_tpu.toolkit.reflector_analysis import (
    compute_rcs,
    reflector_pose,
    trace_reflections,
)
from pointcloudprocessing_tpu.toolkit.radar_truth import (
    lookup_truth_position,
    compute_centroid,
    CalibrationAccumulator,
)
from pointcloudprocessing_tpu.toolkit.training_history import load_training_history
from pointcloudprocessing_tpu.toolkit.plotting import PointCloudPlot

__all__ = [
    "solve_kabsch",
    "moller_trumbore",
    "get_reflection",
    "OptiTrack",
    "Provizio",
    "ROS",
    "TQDMCapture",
    "globals",
    "mat_ops",
    "compute_rcs",
    "reflector_pose",
    "trace_reflections",
    "lookup_truth_position",
    "compute_centroid",
    "CalibrationAccumulator",
    "load_training_history",
    "PointCloudPlot",
]

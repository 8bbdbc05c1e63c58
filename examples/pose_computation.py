"""Relative-pose math from a palindrome state log.

Script equivalent of the reference's ``examples/pose_computation.ipynb``:
parse a ``_palindrome_state__*.log``, compute the tanker pose in the sensor
frame per frame (same SE(3) algebra as the ingest path), and report Euler
angle/translation trajectories.

Usage: python examples/pose_computation.py <palindrome_state_log>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcloudprocessing_tpu.data.frames import parse_state_info
from pointcloudprocessing_tpu.toolkit import mat_ops


def main(path: str) -> None:
    info = parse_state_info(path)
    print(f"frames: {len(info)}")
    for frame in sorted(info)[:20]:
        rel = info[frame].get("tanker_in_sensor_frame")
        if rel is None:
            print(f"frame {frame}: no Sensor/Tanker poses in log")
            continue
        angles = mat_ops.get_roll_pitch_yaw_deg(rel[:3, :3])
        t = rel[:3, 3]
        print(
            f"frame {frame}: t=({t[0]:+.2f}, {t[1]:+.2f}, {t[2]:+.2f}) m  "
            f"rpy=({float(angles['roll']):+.1f}, {float(angles['pitch']):+.1f}, "
            f"{float(angles['yaw']):+.1f}) deg"
        )
    if len(info) > 20:
        print(f"... {len(info) - 20} more frames")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1])

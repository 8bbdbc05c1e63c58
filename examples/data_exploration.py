"""mmWave radar CSV -> global-frame point cloud.

Script equivalent of the reference's ``examples/data_exploration.ipynb``:
read range/azimuth/elevation returns from a CSV, convert each to a global
cartesian point with the radar's pose (``convert_radar_to_global``), and
write an AftrBurner-style frame.

CSV columns expected: range_m, azimuth_deg, elevation_deg[, strength]

Usage: python examples/data_exploration.py <returns.csv> [out_frame.txt]
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcloudprocessing_tpu.data.frames import write_aftr_frame
from pointcloudprocessing_tpu.ops import mat_ops

RADAR_POS = np.array([0.0, 0.0, 1.0])       # radar mounting position (m)
RADAR_RPY = np.array([0.0, 0.0, 0.0])       # roll/pitch/yaw (deg)
SCALE_RANGE = 1.0                           # range scaling (notebook cell 2)


def main(csv_path: str, out_path: str | None = None) -> None:
    df = pd.read_csv(csv_path)
    rae = df[["range_m", "azimuth_deg", "elevation_deg"]].to_numpy(dtype=float)
    rae[:, 0] *= SCALE_RANGE

    points = np.asarray(
        mat_ops.convert_radar_to_global(rae, RADAR_POS, RADAR_RPY)
    )
    print(f"{len(points)} returns -> global frame")
    print("extent x/y/z:",
          points.min(axis=0).round(2), "to", points.max(axis=0).round(2))

    if out_path:
        write_aftr_frame(out_path, points)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)

"""Build and persist a PointCloudSet from an AftrBurner collect directory.

Script parity: examples/build_from_aftr.py in the reference — updated to the
current PointCloudSet API (the reference script calls a stale signature,
SURVEY §2 A12; this one works).

Usage: python build_from_aftr.py <collect_dir> [data_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcloudprocessing_tpu.data import PointCloudSet

PART_LABELS = [
    "fuselage", "left_engine", "right_engine", "left_wing", "right_wing",
    "left_hstab", "right_hstab", "vstab", "left_boom_stab", "right_boom_stab",
    "boom_wing", "boom_hull", "boom_hose",
]

if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("Please input a path to the Aftr directory")
        sys.exit(1)
    aftr_path = sys.argv[1]
    data_dir = (sys.argv[2] if len(sys.argv) > 2 else "data") + "/"

    if not os.path.isdir(aftr_path):
        print("Invalid path provided.")
        sys.exit(1)

    os.makedirs(data_dir, exist_ok=True)
    pc = PointCloudSet(
        name=aftr_path.rstrip("/").split("/")[-1],
        class_labels=["kc46"],
        part_labels=PART_LABELS,
        network_input_width=4096,
        batch_size=8,
        rand_seed=42,
        data_path=data_dir,
    )
    pc.add_from_aftr_output(aftr_path)
    print(pc.get_info())
    print(f"Dataset written under {data_dir}{pc._name}/ (pc_set.joblib + TFRecords)")

"""Host ingest throughput: synthetic AftrBurner collect -> TFRecord splits.

Measures the full `PointCloudSet.add_from_aftr_output` pass (file read ->
parse -> finite filter -> seeded resample -> Example encode -> TFRecord
framing -> split write) in Mpoints/s, with the native one-pass C++ ingest on
and off. Reference chain: PointCloudSet.py:154-214 at ~0.17 Mpts/s
(BASELINE.md).

Usage: python tools/bench_ingest.py [frames] [points_per_frame]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402

from helpers import make_collect, CLASS_LABELS, PART_LABELS  # noqa: E402


def run(collect: str, out: str, use_native: bool, width: int) -> float:
    from pointcloudprocessing_tpu.data import PointCloudSet
    from pointcloudprocessing_tpu.data import pointcloudset as pcs_mod

    real = pcs_mod.native.native_available
    pcs_mod.native.native_available = (lambda: True) if use_native else (lambda: False)
    try:
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        pc = PointCloudSet(
            name="bench",
            class_labels=CLASS_LABELS,
            part_labels=PART_LABELS,
            network_input_width=width,
            batch_size=8,
            rand_seed=1,
            print_func=lambda *a, **k: None,
            data_path=out + "/",
        )
        t0 = time.process_time()
        pc.add_from_aftr_output(collect)
        return time.process_time() - t0
    finally:
        pcs_mod.native.native_available = real


def main() -> None:
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    ppf = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    width = 8192
    root = "/tmp/pcp_ingest_bench"
    shutil.rmtree(root, ignore_errors=True)
    print(f"writing synthetic collect: {frames} frames x ~{ppf} pts ...")
    collect = make_collect(
        root, num_frames=frames, points_per_frame=ppf, sorted_parts=True
    )
    total_pts = 0
    for i in range(frames):
        with open(f"{collect}/Lidar/frame_{i}.txt", "rb") as f:
            total_pts += sum(1 for _ in f)
    total_bytes = sum(
        os.path.getsize(f"{collect}/Lidar/frame_{i}.txt") for i in range(frames)
    )
    print(f"total: {total_pts/1e6:.2f} M pts, {total_bytes/1e6:.1f} MB text")

    # process CPU time, best of 3: the rig is a 1-core box with background
    # load, so wall time is dominated by scheduler noise
    for label, use_native in [("native", True), ("python", False)]:
        best = min(
            run(collect, os.path.join(root, "out_" + label), use_native, width)
            for _ in range(3)
        )
        print(
            f"{label:>7}: {best:6.2f} s cpu  {total_pts/best/1e6:7.2f} Mpts/s/core  "
            f"{total_bytes/best/1e6:7.1f} MB/s"
        )


if __name__ == "__main__":
    main()

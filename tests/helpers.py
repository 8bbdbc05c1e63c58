"""Shared test fixtures: synthetic AftrBurner collect directories."""

from __future__ import annotations

import os

import numpy as np

CLASS_LABELS = ["kc-46", "f-15_model"]
PART_LABELS = ["wing", "fuselage", "engine"]


def make_collect(
    root: str,
    num_frames: int = 12,
    points_per_frame: int = 40,
    class_name: str = "kc-46",
    seed: int = 0,
    name: str = "collect_2026.Jan.01_00.00.00.0000000.UTC",
    sorted_parts: bool = False,
) -> str:
    """Write a synthetic collect directory in the reference's layout:
    Lidar/frame_N.txt files + _palindrome_state__*.log pose log."""
    rng = np.random.default_rng(seed)
    collect = os.path.join(root, name)
    lidar = os.path.join(collect, "Lidar")
    os.makedirs(lidar, exist_ok=True)

    # pose log: header with 3-space separated keys, then per-frame rows of
    # timestamp, frame, and two column-major 4x4 SE3 blocks.
    lines = ["Time   Frame   Sensor Pose   Tanker Pose"]
    poses = []
    for i in range(num_frames):
        sensor = np.eye(4)
        tanker = np.eye(4)
        tanker[:3, 3] = rng.uniform(-5, 5, 3)
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        tanker[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        poses.append((sensor, tanker))
        row = [f"2026.Jan.01_00.00.{i:02d}.0000000.UTC", str(i)]
        for m in (sensor, tanker):
            row.extend(str(v) for v in m.T.ravel())  # column-major
        lines.append(" ".join(row))
    with open(
        os.path.join(collect, "_palindrome_state__2026.Jan.01_00.00.00.UTC.log"), "w"
    ) as f:
        f.write("\n".join(lines) + "\n")

    for i in range(num_frames):
        n = points_per_frame + int(rng.integers(-5, 6))
        pts = rng.uniform(-10, 10, (n, 3))
        parts = rng.choice(PART_LABELS, n)
        if sorted_parts:
            # real AftrBurner frames come out grouped by part (see the
            # reference_point_clouds files) — long runs of one label
            parts = np.sort(parts)
        with open(os.path.join(lidar, f"frame_{i}.txt"), "w") as f:
            for p, part in zip(pts, parts):
                f.write(f"({p[0]:.3f}, {p[1]:.3f}, {p[2]:.3f}) {class_name} {part}\n")
    return collect

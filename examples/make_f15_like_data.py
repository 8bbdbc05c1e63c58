"""Synthesize f15-scale collects for the second flagship parity run.

The reference's f15 flagship — val segmentation accuracy 0.7874 at
input_width 8192 (point_cloud_analysis/models/f15_scale_lidar/final/
f15_scale_lidar_final_history.json) — trained on five AftrBurner collects
named in f15_lidar_config.json:44-60 that are not redistributable. Unlike
kc46 (`"vanilla": true`), the f15 config leaves `vanilla` unset, so the
model trains WITH both T-Nets (PointNet.py:91 defaults vanilla=False) —
this workload exercises the T-Net path at full flagship scale.

This script regenerates a same-shape workload from the procedural
F-15-like labeled mesh: the same five collect directory names, single
class "f-15_model" (the class the reference's own f-15 template cloud
carries), 8192-point frames with per-point part ground truth through
per-viewpoint hidden-point removal, and a pose log with the viewpoint
DCMs, so `configs/f15_lidar_config.json` runs the real two-stage
curriculum end to end.

Run: ``python examples/make_f15_like_data.py <input_dir> [frames_per_collect]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side synthesis (see kc46 twin)

from pointcloudprocessing_tpu.synthesis.procedural import f15_like_mesh

from make_kc46_like_data import make_collects


def make_f15_collects(
    input_dir: str, frames_per_collect: int = 2400, **kwargs
) -> list[str]:
    config_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs",
        "f15_lidar_config.json",
    )
    return make_collects(
        input_dir,
        frames_per_collect,
        config_path=config_path,
        mesh_factory=f15_like_mesh,
        class_name="f-15_model",
        **kwargs,
    )


if __name__ == "__main__":
    input_dir = sys.argv[1] if len(sys.argv) > 1 else "input"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 2400
    make_f15_collects(input_dir, frames)

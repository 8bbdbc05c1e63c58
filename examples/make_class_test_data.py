"""Synthesize per-class collect directories for the class-test sweep.

Pairs with ``examples/make_class_test_configs.py``: the configs reference one
``collect_<class>`` directory per class; this script fills a data directory
with MeshSampler observations of geometrically distinct procedural shapes
(the reference's class test used recorded collects of 22 aircraft .obj
models — point_cloud_analysis/examples/class_test/ — which are not
redistributable).

Run: ``python examples/make_class_test_data.py <data_dir> [n_classes]``
"""

from __future__ import annotations

import os
import sys

import numpy as np

from pointcloudprocessing_tpu.synthesis import (
    MeshSampler,
    dominant_axis_parts,
    shape_library,
    write_collect,
)

# the single source of the aircraft label list (keeps the generated
# collect_<class> directory names in sync with the configs' dataset names)
from make_class_test_configs import CLASS_LABELS as CLASS_NAMES


def synthesize_class_collects(
    data_dir: str,
    n_classes: int,
    frames_per_class: int = 64,
    sample_points: int = 2048,
    pad: int = 4096,
    seed: int = 42,
) -> list[str]:
    """One collect directory per class; returns the collect paths."""
    meshes = shape_library(n_classes)
    out = []
    for k, ((shape_name, mesh), class_name) in enumerate(
        zip(meshes.items(), CLASS_NAMES)
    ):
        sampler = MeshSampler(None, class_name, mesh=mesh, random_seed=seed + k)
        observations, _, positions, dcms = sampler.create_viewpoint_observations(
            n=frames_per_class, p=sample_points, pad=pad
        )
        parts = dominant_axis_parts(observations)
        collect = write_collect(
            os.path.join(data_dir, f"collect_{class_name}"),
            observations,
            class_name,
            parts,
            dcms=dcms,
            positions=positions,
        )
        print(f"class {k} ({class_name} <- {shape_name}): {collect}")
        out.append(collect)
    return out


if __name__ == "__main__":
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data"
    n_classes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    synthesize_class_collects(data_dir, n_classes)

"""Synthesize kc46-scale collects for the flagship training-parity run.

The reference's headline result — val segmentation accuracy 0.9808 on the
kc46 collects at input_width 8192 (point_cloud_analysis/models/kc46_lidar/
final/kc46_lidar_final_history.json) — trained on four AftrBurner collect
directories named in kc46_lidar_config.json:43-56 that are not
redistributable. This script regenerates a workload of the same shape from
the procedural KC-46-like labeled tanker mesh: the same four collect
directory names, single class "kc-46", 8192-point frames with per-point part
ground truth carried through per-viewpoint hidden-point removal, and a pose
log with the viewpoint DCMs, so `configs/kc46_lidar_config.json` runs the
real two-stage curriculum end to end.

Run: ``python examples/make_kc46_like_data.py <input_dir> [frames_per_collect]``
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# Synthesis is host-side work (numpy + Qhull + small jnp DCM calls); on this
# rig jax defaults to the remote-TPU axon platform where every tiny op pays
# a ~25-30 ms tunnel round trip — pin to CPU before any jax use.
import jax

jax.config.update("jax_platforms", "cpu")

from pointcloudprocessing_tpu.synthesis import MeshSampler, write_collect
from pointcloudprocessing_tpu.synthesis.procedural import kc46_like_mesh

CHUNK = 200  # frames per sampler instance: each chunk re-samples the dense
# surface cloud with a fresh seed, so frames are not all subsets of one
# fixed sampling (the reference's collects came from live per-frame sim)


def collect_names(config_path: str) -> list[str]:
    with open(config_path) as f:
        cfg = json.load(f)
    stage = next(iter(cfg["info"]["training_profiles"].values()))
    return list(stage["datasets"].values())


def make_collects(
    input_dir: str,
    frames_per_collect: int = 2400,
    pad: int = 8192,
    dense_points: int = 20000,
    seed: int = 42,
    config_path: str | None = None,
    mesh_factory=kc46_like_mesh,
    class_name: str = "kc-46",
) -> list[str]:
    """Synthesize the collect directories a flagship config names.

    Parametrized by mesh factory + class name so the f15 twin
    (make_f15_like_data.py) shares the whole pipeline; defaults reproduce
    the kc46 workload."""
    if config_path is None:
        config_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs",
            "kc46_lidar_config.json",
        )
    names = collect_names(config_path)
    mesh, triangle_parts = mesh_factory()
    out = []
    for c, name in enumerate(names):
        t0 = time.time()
        obs_chunks, part_chunks, pos_chunks, dcm_chunks = [], [], [], []
        done = 0
        while done < frames_per_collect:
            n = min(CHUNK, frames_per_collect - done)
            sampler = MeshSampler(
                None, class_name, mesh=mesh, random_seed=seed + 1000 * c + done
            )
            obs, parts, pos, dcms = sampler.create_labeled_viewpoint_observations(
                n=n, p=dense_points, pad=pad, triangle_parts=triangle_parts
            )
            obs_chunks.append(obs)
            part_chunks.append(parts)
            pos_chunks.append(pos)
            dcm_chunks.append(dcms)
            done += n
        collect = write_collect(
            os.path.join(input_dir, name),
            np.concatenate(obs_chunks),
            class_name,
            np.concatenate(part_chunks),
            dcms=np.concatenate(dcm_chunks),
            positions=np.concatenate(pos_chunks),
            fast=True,
        )
        print(
            f"collect {c + 1}/{len(names)}: {frames_per_collect} frames x {pad} pts "
            f"in {time.time() - t0:.0f}s -> {collect}",
            flush=True,
        )
        out.append(collect)
    return out


if __name__ == "__main__":
    input_dir = sys.argv[1] if len(sys.argv) > 1 else "input"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 2400
    make_collects(input_dir, frames)

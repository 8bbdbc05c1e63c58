"""Segmentation-quality regression floor (scaled-down flagship workload).

The flagship parity claim — val segmentation accuracy in the reference band
(0.9808, models/kc46_lidar/final/kc46_lidar_final_history.json) — is proven
by the full-scale TPU run recorded in docs/TRAINING_PARITY.md. That run is
hours long; this test pins a scaled-down version of the same workload (the
procedural KC-46-like tanker, real part vocabulary, per-viewpoint HPR
frames, the reference's `final`-stage trainable/loss profile) so a subtle
BN-momentum / freeze-mask / optimizer regression that costs points of
segmentation accuracy fails CI rather than only showing up in a multi-hour
flagship rerun.

Calibration (measured sweep, round 3): this recipe
(240 frames, lr 3e-4, 70 epochs) reaches best val seg accuracy 0.942 with
a stable 0.92-0.94 plateau from epoch ~28; the 0.88 floor leaves ~0.06 of
seed/scheduler margin while a >=5-point regression cannot pass. Smaller
recipes are NOT calibrated: at 120 frames (11 steps/epoch) the
momentum-0.99 BN running stats never converge and val accuracy sits at
~0.14 for 20+ epochs while train accuracy climbs — any shrink of this
workload must re-run the calibration sweep.
"""

import json
import os

import numpy as np
import pytest

from pointcloudprocessing_tpu.synthesis import MeshSampler, write_collect
from pointcloudprocessing_tpu.synthesis.procedural import kc46_like_mesh

pytestmark = pytest.mark.slow  # multi-minute e2e CPU training

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WIDTH = 256
FRAMES = 240


def _make_config(tmp_path, collect):
    """configs/kc46_lidar_config.json scaled down: same class/part
    vocabulary and the same `final` trainable/loss profile, one collect,
    input_width 256."""
    with open(os.path.join(REPO, "configs", "kc46_lidar_config.json")) as f:
        template = json.load(f)
    final = template["info"]["training_profiles"]["final"]
    final["datasets"] = {"0": os.path.basename(collect)}
    template["info"]["training_profiles"] = {"final": final}
    template["info"]["name"] = "seg_floor"
    template["params"].update(
        {
            "input_width": WIDTH,
            "epochs": 70,
            "patience": 70,
            "batch_size": 8,
            "vanilla": True,
            "learning": {"rate": 3e-4, "decay_steps": 7000, "decay_rate": 0.7},
        }
    )
    template["file_system"] = {
        "model_path": str(tmp_path / "models") + "/",
        "input_path": str(tmp_path / "input") + "/",
        "data_path": str(tmp_path / "data") + "/",
    }
    os.makedirs(tmp_path / "models", exist_ok=True)
    os.makedirs(tmp_path / "data", exist_ok=True)
    path = str(tmp_path / "seg_floor_config.json")
    with open(path, "w") as f:
        json.dump(template, f)
    return path


def test_seg_val_accuracy_floor(tmp_path):
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    in_dir = tmp_path / "input"
    os.makedirs(in_dir, exist_ok=True)

    mesh, triangle_parts = kc46_like_mesh()
    sampler = MeshSampler(None, "kc-46", mesh=mesh, random_seed=11)
    obs, parts, pos, dcms = sampler.create_labeled_viewpoint_observations(
        n=FRAMES, p=3000, pad=WIDTH, triangle_parts=triangle_parts
    )
    collect = write_collect(
        str(in_dir / "collect_seg_floor"),
        obs,
        "kc-46",
        parts,
        dcms=dcms,
        positions=pos,
        fast=True,
    )

    config_path = _make_config(tmp_path, collect)
    tp = TrainProfile(config_path, log_to_file=False)
    histories = tp.train()
    val_acc = histories["final"][
        "val_segmentation_output_sparse_categorical_accuracy"
    ]
    best = max(val_acc)
    print(
        f"\nseg-floor calibration: best={best:.4f} "
        f"tail={[round(v, 3) for v in val_acc[-5:]]}"
    )
    assert best >= 0.88, (
        f"best val seg accuracy {best:.4f} under the 0.88 floor "
        f"(curve tail: {[round(v, 3) for v in val_acc[-5:]]})"
    )

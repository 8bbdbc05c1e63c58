"""Class-test sweep: config family + N-way classification end to end.

Covers the reference's ``examples/class_test/bertha_*_config.json``
experiments (2-to-21-way classification over the aircraft library): the
checked-in configs must parse, and a miniature 4-way run over MeshSampler-
synthesized shape data must learn above chance — the multi-class exercise
the kc46/f15 single-class datasets never provide.
"""

import glob
import json
import os
import sys

import numpy as np
import pytest

from pointcloudprocessing_tpu.core.config import load_config
from pointcloudprocessing_tpu.synthesis import (
    MeshSampler,
    dominant_axis_parts,
    shape_library,
    write_collect,
)

pytestmark = pytest.mark.slow  # multi-minute e2e: opt out with -m "not slow"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs", "class_test")

WIDTH = 64
N_CLASSES = 4
CLASS_NAMES = ["a-10", "b-1b", "b-2", "c-5"]


def test_all_class_test_configs_parse():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "bertha_*_config.json")))
    assert len(paths) == 10
    for path in paths:
        cfg = load_config(path)
        assert cfg.num_classes == 22
        assert cfg.num_parts == 12
        assert cfg.input_width == 4096
        assert cfg.stages, path
        for stage in cfg.stages:
            # every sweep trains the classification head on >= 2 classes
            assert stage.trainable.classification_head
            assert len(stage.datasets) >= 2
            assert stage.loss_weights.classification > 0


def test_sweep_sizes_match_reference():
    """Dataset count per sweep mirrors the reference family (2..21)."""
    sizes = {}
    for path in glob.glob(os.path.join(CONFIG_DIR, "bertha_*_config.json")):
        cfg = load_config(path)
        word = os.path.basename(path).split("_")[1]
        sizes[word] = len(cfg.stages[0].datasets)
    assert sizes == {
        "two": 2, "four": 4, "six": 6, "eight": 8, "ten": 10, "twelve": 12,
        "fourteen": 14, "sixteen": 16, "eighteen": 18, "twentyone": 21,
    }


def _make_tiny_class_config(tmp_path, collects):
    """A bertha_four-shaped config at test scale."""
    template = json.load(
        open(os.path.join(CONFIG_DIR, "bertha_four_class_config.json"))
    )
    for stage in template["info"]["training_profiles"].values():
        stage["datasets"] = {
            str(i): os.path.basename(c) for i, c in enumerate(collects)
        }
    template["params"].update(
        # the val pass reads the momentum-0.99 BN running averages, whose
        # time constant is ~100 steps — needs 40 epochs x 18 steps to settle
        {"input_width": WIDTH, "epochs": 40, "batch_size": 8, "vanilla": True,
         "learning": {"rate": 3e-3, "decay_steps": 1000, "decay_rate": 0.9},
         "regularize_input_transform": False}
    )
    # single classification stage keeps the CPU run short
    profiles = template["info"]["training_profiles"]
    template["info"]["training_profiles"] = {
        "four_class_class": profiles["four_class_class"]
    }
    template["file_system"] = {
        "model_path": str(tmp_path / "models") + "/",
        "input_path": str(tmp_path / "input") + "/",
        "data_path": str(tmp_path / "data") + "/",
    }
    os.makedirs(tmp_path / "models", exist_ok=True)
    os.makedirs(tmp_path / "data", exist_ok=True)
    path = str(tmp_path / "bertha_tiny_config.json")
    with open(path, "w") as f:
        json.dump(template, f)
    return path


@pytest.fixture(scope="module")
def four_class_run(tmp_path_factory):
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    tmp_path = tmp_path_factory.mktemp("class_test")
    in_dir = tmp_path / "input"
    os.makedirs(in_dir, exist_ok=True)

    meshes = shape_library(N_CLASSES)
    collects = []
    for k, ((_, mesh), class_name) in enumerate(zip(meshes.items(), CLASS_NAMES)):
        sampler = MeshSampler(None, class_name, mesh=mesh, random_seed=7 + k)
        obs, _, positions, dcms = sampler.create_viewpoint_observations(
            n=48, p=400, pad=WIDTH
        )
        parts = dominant_axis_parts(obs)
        collects.append(
            write_collect(
                str(in_dir / f"collect_{class_name}"),
                obs, class_name, parts, dcms=dcms, positions=positions,
            )
        )

    config_path = _make_tiny_class_config(tmp_path, collects)
    tp = TrainProfile(config_path, log_to_file=False)
    histories = tp.train()
    return histories


def test_four_way_learns_above_chance(four_class_run):
    acc = four_class_run["four_class_class"][
        "classification_output_sparse_categorical_accuracy"
    ]
    # Calibrated threshold (not just "above chance"): the run's final-epoch
    # train accuracy measures 0.93-0.99 across seeds (last-5 window
    # [0.971, 0.963, 0.993, 0.934, 0.978]); 0.80 leaves jitter margin while
    # still failing on any optimizer/BN/freeze regression that costs real
    # accuracy on 4 balanced classes (chance 0.25).
    assert acc[-1] > 0.80, f"final train accuracy {acc[-1]} under the 0.80 floor"


def test_four_way_val_accuracy(four_class_run):
    val_acc = four_class_run["four_class_class"][
        "val_classification_output_sparse_categorical_accuracy"
    ]
    # Measured best val accuracy is 1.0 (last-5 window >= 0.969); 0.85 is a
    # calibrated floor that a >=5-point regression cannot pass.
    assert max(val_acc) > 0.85, f"best val accuracy {max(val_acc)} under the 0.85 floor"


@pytest.fixture(scope="module")
def four_class_run_pointnet2(tmp_path_factory):
    """The same 4-way exercise through the PointNet++ family
    (params.model='pointnet2') — pins that the second family LEARNS through
    the full driver, not just that it runs."""
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    tmp_path = tmp_path_factory.mktemp("class_test_pn2")
    in_dir = tmp_path / "input"
    os.makedirs(in_dir, exist_ok=True)

    meshes = shape_library(N_CLASSES)
    collects = []
    for k, ((_, mesh), class_name) in enumerate(zip(meshes.items(), CLASS_NAMES)):
        sampler = MeshSampler(None, class_name, mesh=mesh, random_seed=7 + k)
        obs, _, positions, dcms = sampler.create_viewpoint_observations(
            n=48, p=400, pad=WIDTH
        )
        parts = dominant_axis_parts(obs)
        collects.append(
            write_collect(
                str(in_dir / f"collect_{class_name}"),
                obs, class_name, parts, dcms=dcms, positions=positions,
            )
        )

    config_path = _make_tiny_class_config(tmp_path, collects)
    with open(config_path) as f:
        cfg = json.load(f)
    cfg["params"]["model"] = "pointnet2"
    with open(config_path, "w") as f:
        json.dump(cfg, f)
    tp = TrainProfile(config_path, log_to_file=False)
    return tp.train()


def test_pointnet2_four_way_learns(four_class_run_pointnet2):
    h = four_class_run_pointnet2["four_class_class"]
    acc = h["classification_output_sparse_categorical_accuracy"]
    val_acc = h["val_classification_output_sparse_categorical_accuracy"]
    # Calibrated: measured last-5 train acc [0.919, 0.941, 0.963, 0.926,
    # 0.949] and best val 0.875 (the ~28-sample val split is granular, so
    # the val floor sits lower than the PointNet test's). 0.75/0.55 fail on
    # any real grouping/gather/knn regression (chance 0.25) while leaving
    # seed margin.
    assert acc[-1] > 0.75, f"final train accuracy {acc[-1]} under the 0.75 floor"
    assert max(val_acc) > 0.55, f"best val accuracy {max(val_acc)} under the 0.55 floor"


@pytest.fixture(scope="module")
def four_class_run_dgcnn(tmp_path_factory):
    """The same 4-way exercise through the DGCNN family
    (params.model='dgcnn') — pins that the third family LEARNS through the
    full driver: dynamic kNN graphs, one-hot gathers, edge MLPs, freeze
    chaining."""
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    tmp_path = tmp_path_factory.mktemp("class_test_dgcnn")
    in_dir = tmp_path / "input"
    os.makedirs(in_dir, exist_ok=True)

    meshes = shape_library(N_CLASSES)
    collects = []
    for k, ((_, mesh), class_name) in enumerate(zip(meshes.items(), CLASS_NAMES)):
        sampler = MeshSampler(None, class_name, mesh=mesh, random_seed=11 + k)
        obs, _, positions, dcms = sampler.create_viewpoint_observations(
            n=48, p=400, pad=WIDTH
        )
        parts = dominant_axis_parts(obs)
        collects.append(
            write_collect(
                str(in_dir / f"collect_{class_name}"),
                obs, class_name, parts, dcms=dcms, positions=positions,
            )
        )

    config_path = _make_tiny_class_config(tmp_path, collects)
    with open(config_path) as f:
        cfg = json.load(f)
    cfg["params"]["model"] = "dgcnn"
    with open(config_path, "w") as f:
        json.dump(cfg, f)
    tp = TrainProfile(config_path, log_to_file=False)
    return tp.train()


def test_dgcnn_four_way_learns(four_class_run_dgcnn):
    h = four_class_run_dgcnn["four_class_class"]
    acc = h["classification_output_sparse_categorical_accuracy"]
    val_acc = h["val_classification_output_sparse_categorical_accuracy"]
    # Floors calibrated the same way as the PN++ test (chance 0.25, ~28
    # granular val samples); tighten once multi-seed data accumulates.
    assert acc[-1] > 0.75, f"final train accuracy {acc[-1]} under the 0.75 floor"
    assert max(val_acc) > 0.55, f"best val accuracy {max(val_acc)} under the 0.55 floor"

"""Training-driver guard rails."""

import json
import os

import pytest

from helpers import CLASS_LABELS, PART_LABELS


def test_empty_stage_raises(tmp_path):
    """A stage with no ingested data must fail loudly, not train on zero
    batches (regression: silent zero-metric 'training')."""
    from pointcloudprocessing_tpu.core.config import parse_config
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    for sub in ("models", "data", "input"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    config = {
        "info": {
            "name": "empty",
            "class_labels": {str(i): c for i, c in enumerate(CLASS_LABELS)},
            "part_labels": {str(i): p for i, p in enumerate(PART_LABELS)},
            "training_profiles": {
                "final": {
                    "datasets": {},
                    "noise": {"x_stdev_m": 0, "y_stdev_m": 0, "z_stdev_m": 0},
                    "trainable": {"shared_network": True, "input_transform": True,
                                  "classification_head": True, "segmentation_head": True},
                    "loss_weights": {"classification": 1.0, "segmentation": 0.0,
                                     "rotation": 0.0},
                    "monitor": "val_loss",
                }
            },
            "continue_training_model": "",
        },
        "params": {
            "input_width": 32, "epochs": 1, "patience": 5, "batch_size": 4,
            "learning": {"rate": 1e-3, "decay_steps": 100, "decay_rate": 0.9},
            "random_seed": 42, "debugging": False, "vanilla": True,
            "regularize_input_transform": False,
            "regularize_feature_transform": False,
        },
        "file_system": {
            "model_path": str(tmp_path / "models") + "/",
            "input_path": str(tmp_path / "input") + "/",
            "data_path": str(tmp_path / "data") + "/",
        },
    }
    tp = TrainProfile(parse_config(config), log_to_file=False)
    with pytest.raises(RuntimeError, match="has no data"):
        tp.train()


def test_bad_paths_raise(tmp_path):
    from pointcloudprocessing_tpu.core.config import parse_config
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    config = {
        "info": {"name": "x", "class_labels": {"0": "a"}, "part_labels": {"0": "p"},
                 "training_profiles": {}, "continue_training_model": ""},
        "params": {"input_width": 32, "epochs": 1, "patience": 1, "batch_size": 2,
                   "learning": {"rate": 1e-3, "decay_steps": 10, "decay_rate": 0.9},
                   "random_seed": 1, "debugging": False, "vanilla": True,
                   "regularize_input_transform": False,
                   "regularize_feature_transform": False},
        "file_system": {"model_path": str(tmp_path / "nope") + "/",
                        "input_path": str(tmp_path) + "/",
                        "data_path": str(tmp_path) + "/"},
    }
    with pytest.raises(FileNotFoundError, match="model_path"):
        TrainProfile(parse_config(config), log_to_file=False)

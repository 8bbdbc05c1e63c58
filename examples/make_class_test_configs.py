"""Generate the class-count sweep configs (``configs/class_test/``).

Replicates the reference's 10-file ``bertha_*_config.json`` family
(reference: ``point_cloud_analysis/examples/class_test/``): a 2-to-21-way
classification sweep over the 22-aircraft library, all sharing the same
label maps and hyperparameters. The two smallest sweeps are two-stage
(classification then classification+segmentation at 0.7/0.3 loss weights,
batch 32); the larger ones are single-stage classification-only at batch 64.

Dataset entries name per-class collect directories (``collect_<class>``);
point ``file_system.input_path`` at a directory containing one synthesized
collect per class (see ``examples/make_class_test_data.py``).

Run: ``python examples/make_class_test_configs.py [out_dir]``
"""

from __future__ import annotations

import json
import os
import sys

CLASS_LABELS = [
    "a-10", "b-1b", "b-2", "c-5", "c-12", "c-17a", "c-32", "c-130j",
    "e-3", "f-15e", "f-16", "f-18e", "f-22", "g-iii", "kc-46", "kc-135",
    "lj-25", "mig-29", "mq-20", "su-27", "vc-25a", "x-47b",
]
PART_LABELS = [
    "wing", "fuselage", "engine", "hstab", "vstab", "landing_gear",
    "armament", "boom_wing", "boom_hull", "boom_hose", "dish", "probe",
]

# (file stem, class count, word used in stage names)
SWEEPS = [
    ("two", 2), ("four", 4), ("six", 6), ("eight", 8), ("ten", 10),
    ("twelve", 12), ("fourteen", 14), ("sixteen", 16), ("eighteen", 18),
    ("twentyone", 21),
]

NOISE = {"x_stdev_m": 0.01, "y_stdev_m": 0.01, "z_stdev_m": 0.01}


def _datasets(n: int) -> dict:
    return {str(i): f"collect_{CLASS_LABELS[i]}" for i in range(n)}


def build_config(word: str, n: int) -> dict:
    two_stage = n <= 4
    if word == "two":
        # the reference fine-tunes segmentation from a previously trained
        # classification checkpoint via continue_training_model; here the
        # classification stage is part of the config so the sweep is runnable
        # from scratch (stage chaining supplies the same continuation)
        profiles = {
            "two_class_classification": {
                "datasets": _datasets(n),
                "noise": NOISE,
                "trainable": {
                    "shared_network": True, "input_transform": False,
                    "classification_head": True, "segmentation_head": False,
                },
                "loss_weights": {
                    "classification": 1.0, "segmentation": 0.0, "rotation": 0.0,
                },
            },
            "two_class_segmentation": {
                "datasets": _datasets(n),
                "noise": NOISE,
                "trainable": {
                    "shared_network": True, "input_transform": False,
                    "classification_head": True, "segmentation_head": True,
                },
                "loss_weights": {
                    "classification": 0.7, "segmentation": 0.3, "rotation": 0.0,
                },
            },
        }
        continue_model = ""
    elif word == "four":
        profiles = {
            "four_class_class": {
                "datasets": _datasets(n),
                "noise": NOISE,
                "trainable": {
                    "shared_network": True, "input_transform": False,
                    "classification_head": True, "segmentation_head": False,
                },
                "loss_weights": {
                    "classification": 1.0, "segmentation": 0.0, "rotation": 0.0,
                },
            },
            "four_class_seg": {
                "datasets": _datasets(n),
                "noise": NOISE,
                "trainable": {
                    "shared_network": True, "input_transform": False,
                    "classification_head": True, "segmentation_head": True,
                },
                "loss_weights": {
                    "classification": 0.7, "segmentation": 0.3, "rotation": 0.0,
                },
            },
        }
        continue_model = ""
    else:
        profiles = {
            f"{word}_class": {
                "datasets": _datasets(n),
                "noise": NOISE,
                "trainable": {
                    "shared_network": True, "input_transform": True,
                    "classification_head": True, "segmentation_head": False,
                },
                "loss_weights": {
                    "classification": 1.0, "segmentation": 0.0, "rotation": 0.0,
                },
            }
        }
        continue_model = ""

    return {
        "info": {
            "name": "_bertha_classification_test",
            "class_labels": {str(i): c for i, c in enumerate(CLASS_LABELS)},
            "part_labels": {str(i): p for i, p in enumerate(PART_LABELS)},
            "training_profiles": profiles,
            "continue_training_model": continue_model,
        },
        "params": {
            "input_width": 4096,
            "epochs": 5000,
            "patience": 30 if two_stage else 100,
            "batch_size": 32 if two_stage else 64,
            "learning": {"rate": 0.001, "decay_steps": 7000, "decay_rate": 0.7},
            "random_seed": 42,
            "debugging": False,
            "regularize_input_transform": True,
            "regularize_feature_transform": False,
        },
        "file_system": {
            "model_path": "models/",
            "input_path": "data/",
            "data_path": "data/",
        },
    }


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for word, n in SWEEPS:
        path = os.path.join(out_dir, f"bertha_{word}_class_config.json")
        with open(path, "w") as f:
            json.dump(build_config(word, n), f, indent=4)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    default = os.path.join(os.path.dirname(__file__), "..", "configs", "class_test")
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.normpath(default))

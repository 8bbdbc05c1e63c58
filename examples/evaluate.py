"""Summarize training histories and evaluate a checkpoint on a test split.

Script equivalent of the reference's ``examples/evaluate.ipynb``: training-
curve summaries per stage (best epoch, best val accuracy/loss) plus a
model.evaluate-style pass over the test set.

Usage: python examples/evaluate.py <model_dir> [<data_dir>/<set_name>]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcloudprocessing_tpu.toolkit.training_history import load_training_history


def summarize(model_dir: str) -> None:
    history = load_training_history(model_dir)
    if not history:
        print(f"No *_history.json found under {model_dir}")
        return
    print(f"== {model_dir} ==")
    for key in sorted(history):
        series = np.asarray(history[key], dtype=float)
        if "loss" in key:
            best_epoch = int(series.argmin()) + 1
            print(f"  {key}: min {series.min():.4f} @ epoch {best_epoch}")
        elif "accuracy" in key:
            best_epoch = int(series.argmax()) + 1
            print(f"  {key}: max {series.max():.4f} @ epoch {best_epoch}")


def evaluate_checkpoint(model_dir: str, set_dir: str) -> None:
    import jax

    from pointcloudprocessing_tpu.data.pointcloudset import load_from_file
    from pointcloudprocessing_tpu.models import PointNet
    from pointcloudprocessing_tpu.train.callbacks import load_checkpoint
    from pointcloudprocessing_tpu.train.steps import make_eval_step, TrainState

    pc = load_from_file(os.path.join(set_dir, "pc_set.joblib"))
    arrays = pc.load_split_arrays("test")
    if arrays["observations"].shape[0] == 0:
        print("Test split is empty.")
        return

    payload = load_checkpoint(model_dir)
    num_classes = payload["params"]["mlp_cls_3"]["dense"]["kernel"].shape[1]
    num_parts = payload["params"]["mlp_seg_5"]["conv"]["kernel"].shape[1]
    vanilla = "input_transform" not in payload["params"]
    model = PointNet(num_classes=num_classes, num_parts=num_parts, vanilla=vanilla)

    state = TrainState(
        step=0, params=payload["params"], batch_stats=payload["batch_stats"],
        opt_state=None,
    )
    eval_step = make_eval_step(model, (1.0, 1.0, 1.0), apply_jitter=False)
    logs = eval_step(
        state,
        arrays["observations"],
        {
            "classification_output": arrays["class_label"],
            "segmentation_output": arrays["part_labels"],
            "se3": arrays["se3"],
        },
        jax.random.key(0),
    )
    print(f"test loss: {float(logs['loss']):.4f}")
    print(
        "test classification accuracy: "
        f"{float(logs['classification_correct']) / float(logs['classification_total']):.4f}"
    )
    print(
        "test segmentation accuracy: "
        f"{float(logs['segmentation_correct']) / float(logs['segmentation_total']):.4f}"
    )


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    summarize(sys.argv[1])
    if len(sys.argv) > 2:
        evaluate_checkpoint(sys.argv[1], sys.argv[2])

"""Hyperparameter grid search over optimizers and learning rates.

Parity target: the ``HyperTune`` workflow in
``examples/hyperparameter_tuning.ipynb`` (cells 1-14) — a SGD/Adagrad/Adam x
{1e-4, 1e-3, 1e-2} grid, per-cell best-validation-score collection, a
combined table, per-configuration averages, and LaTeX export.

``run_grid`` drives actual training sweeps through the jitted train/eval
steps; ``HyperTune`` aggregates histories with the notebook's semantics
(max of the val score key, min of val_loss per configuration).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable

import jax
import numpy as np
import optax

from pointcloudprocessing_tpu.core.config import LearningConfig
from pointcloudprocessing_tpu.models.pointnet import FreezeFlags, PointNet
from pointcloudprocessing_tpu.train import steps as steps_lib

OPTIMIZERS: dict[str, Callable] = {
    "SGD": optax.sgd,
    "Adagrad": optax.adagrad,
    "Adam": lambda lr: optax.adam(lr, eps=1e-7),
}
LEARNING_RATES = (1e-4, 1e-3, 1e-2)


class HyperTune:
    """Aggregates per-model grid results (notebook cell 1 semantics)."""

    def __init__(self, val_score_key: str):
        self._val_score_key = val_score_key
        self._rows: list[dict] = []

    def add_data(self, history: dict) -> None:
        """history: {'Model': name, '<Opt> <lr>': history-dict, ...}."""
        row: dict = {}
        for key, value in history.items():
            if key == "Model":
                row["Model"] = value
            else:
                row[key] = {
                    self._val_score_key: max(value[self._val_score_key]),
                    "val_loss": min(value["val_loss"]),
                }
        self._rows.append(row)

    def get_table(self) -> dict:
        """{model: {config: {score, val_loss}}}."""
        return {
            row["Model"]: {k: v for k, v in row.items() if k != "Model"}
            for row in self._rows
        }

    def get_overview(self) -> dict:
        """Average score/val_loss per configuration across models."""
        sums: dict[str, dict] = defaultdict(lambda: {"score": 0.0, "val_loss": 0.0})
        for row in self._rows:
            for key, value in row.items():
                if key == "Model":
                    continue
                sums[key]["score"] += value[self._val_score_key]
                sums[key]["val_loss"] += value["val_loss"]
        n = max(len(self._rows), 1)
        return {
            k: {self._val_score_key: v["score"] / n, "val_loss": v["val_loss"] / n}
            for k, v in sums.items()
        }

    def to_latex(self) -> str:
        """LaTeX table of the overview (notebook exports via df.to_latex)."""
        overview = self.get_overview()
        lines = [
            "\\begin{tabular}{lrr}",
            "\\toprule",
            f"Configuration & {self._val_score_key.replace('_', ' ')} & val loss \\\\",
            "\\midrule",
        ]
        for config, vals in overview.items():
            lines.append(
                f"{config} & {vals[self._val_score_key]:.4f} & {vals['val_loss']:.4f} \\\\"
            )
        lines += ["\\bottomrule", "\\end{tabular}"]
        return "\n".join(lines)


def run_grid(
    train_batch,
    val_batch,
    num_classes: int,
    num_parts: int,
    input_width: int,
    epochs: int = 5,
    steps_per_epoch: int = 8,
    optimizers: dict[str, Callable] | None = None,
    learning_rates=LEARNING_RATES,
    vanilla: bool = True,
    seed: int = 42,
    print_func=print,
) -> dict[str, dict]:
    """Train the grid on in-memory batches; returns {'<Opt> <lr>': history}.

    train_batch/val_batch: (x, targets) tuples (targets keyed by
    MODEL_OUTPUTS). Kept deliberately small-scale — the notebook's grid runs
    minutes per cell; callers feed representative subsets.
    """
    optimizers = optimizers if optimizers is not None else OPTIMIZERS
    results: dict[str, dict] = {}
    model = PointNet(num_classes=num_classes, num_parts=num_parts, vanilla=vanilla)
    freeze = FreezeFlags()

    for opt_name, opt_fn in optimizers.items():
        for lr in learning_rates:
            label = f"{opt_name} {lr}"
            print_func(f"HyperTune: training {label}")
            state, _ = steps_lib.init_train_state(
                model, jax.random.key(seed), input_width,
                LearningConfig(rate=lr), freeze,
            )
            optimizer = opt_fn(lr)
            # re-init optimizer state for the custom transform
            state = state.replace(opt_state=optimizer.init(state.params))
            train_step = steps_lib.make_train_step(
                model, optimizer, (1.0, 1.0, 0.0), freeze, (0.0, 0.0, 0.0)
            )
            eval_step = steps_lib.make_eval_step(model, (1.0, 1.0, 0.0))

            history = defaultdict(list)
            rng = jax.random.key(seed)
            x, targets = train_batch
            vx, vtargets = val_batch
            for epoch in range(epochs):
                logs = None
                for _ in range(steps_per_epoch):
                    state, logs = train_step(state, x, targets, rng)
                vlogs = eval_step(state, vx, vtargets, rng)
                history["loss"].append(float(logs["loss"]))
                history["val_loss"].append(float(vlogs["loss"]))
                history["val_classification_output_sparse_categorical_accuracy"].append(
                    float(vlogs["classification_correct"]) / float(vlogs["classification_total"])
                )
                history["val_segmentation_output_sparse_categorical_accuracy"].append(
                    float(vlogs["segmentation_correct"]) / float(vlogs["segmentation_total"])
                )
                history["val_root_mean_squared_error"].append(
                    float(np.sqrt(vlogs["se3_sq_sum"] / vlogs["se3_count"]))
                )
            results[label] = dict(history)
    return results

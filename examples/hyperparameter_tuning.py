"""Optimizer/learning-rate grid search with LaTeX export.

Script equivalent of ``examples/hyperparameter_tuning.ipynb`` (cells 1-14):
SGD/Adagrad/Adam x {1e-4, 1e-3, 1e-2}, aggregated in a HyperTune table with
per-configuration averages, exported to LaTeX.

Usage: python examples/hyperparameter_tuning.py [epochs]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointcloudprocessing_tpu.train.hypertune import HyperTune, run_grid


def make_toy_batches(width=64, batch=16, num_classes=4, num_parts=2, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    def batch_of(seed2):
        gen = np.random.default_rng(seed2)
        x = gen.normal(size=(batch, width, 3)).astype(np.float32)
        cls = gen.integers(0, num_classes, batch).astype(np.int32)
        x[:, :, 0] += cls[:, None] * 3.0
        parts = (x[:, :, 2] > 0).astype(np.int32)
        return jnp.asarray(x), {
            "classification_output": jnp.asarray(cls),
            "segmentation_output": jnp.asarray(parts),
            "se3": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))),
        }

    return batch_of(1), batch_of(2)


def main(epochs: int = 3) -> None:
    train_batch, val_batch = make_toy_batches()
    results = run_grid(
        train_batch, val_batch,
        num_classes=4, num_parts=2, input_width=64,
        epochs=epochs, steps_per_epoch=4,
    )
    tune = HyperTune("val_classification_output_sparse_categorical_accuracy")
    tune.add_data({"Model": "toy_pointnet", **results})

    print("\n=== per-configuration results ===")
    for config, metrics in tune.get_table()["toy_pointnet"].items():
        print(f"  {config}: {metrics}")
    print("\n=== overview (averaged) ===")
    for config, metrics in tune.get_overview().items():
        print(f"  {config}: {metrics}")
    print("\n=== LaTeX ===")
    print(tune.to_latex())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)

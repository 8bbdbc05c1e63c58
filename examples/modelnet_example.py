"""Public-dataset sanity workload: PointNet classification on ModelNet10.

Mirrors the reference's ModelNet walkthrough (examples/pointnet_example.ipynb
— the Keras PointNet tutorial): sample point clouds from the dataset's .off
meshes, train the classifier, report train/val accuracy.

Usage:
  python examples/modelnet_example.py /path/to/ModelNet10 [epochs]

When no dataset path is given (or it doesn't exist), the script falls back
to the procedural shape library so the workflow stays runnable in a clean
environment (this image has no network egress to download ModelNet).
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

from pointcloudprocessing_tpu.synthesis import MeshSampler, shape_library
from pointcloudprocessing_tpu.synthesis.mesh import load_off

NUM_POINTS = 1024
CLOUDS_PER_CLASS = {"train": 32, "test": 8}


def modelnet_meshes(root: str, split: str, per_class: int):
    """Yield (class_name, Mesh) from a ModelNet10/40-layout directory
    (<root>/<class>/<split>/<class>_NNNN.off)."""
    for class_dir in sorted(glob.glob(os.path.join(root, "*"))):
        if not os.path.isdir(class_dir):
            continue
        class_name = os.path.basename(class_dir)
        for path in sorted(
            glob.glob(os.path.join(class_dir, split, "*.off"))
        )[:per_class]:
            yield class_name, load_off(path)


def build_arrays(pairs, num_points: int, seed: int = 0, label_map: dict | None = None):
    """Sample one fixed-size cloud per mesh; returns (x, y, class names).

    ``label_map`` fixes the class-name -> label assignment (the TEST split
    must reuse the TRAIN split's map, or a class missing from one split
    silently shifts every later label)."""
    clouds, labels = [], []
    names = {} if label_map is None else dict(label_map)
    frozen = label_map is not None
    for i, (class_name, mesh) in enumerate(pairs):
        if frozen:
            if class_name not in names:
                print(
                    f"Skipping a '{class_name}' mesh: the class has no "
                    "training meshes, so it has no label"
                )
                continue
            label = names[class_name]
        else:
            label = names.setdefault(class_name, len(names))
        # distinct sampling per mesh instance (repeated meshes in the
        # procedural fallback must still yield distinct clouds)
        sampler = MeshSampler(None, class_name, mesh=mesh, random_seed=seed + i)
        obs, _, _, _ = sampler.create_full_sample_observations(
            n=1, p=num_points, pad=num_points
        )
        clouds.append(obs[0])
        labels.append(label)
    x = np.asarray(clouds, np.float32)
    y = np.asarray(labels, np.int32)
    return x, y, names


def fallback_pairs(split: str):
    lib = shape_library(4)
    n = CLOUDS_PER_CLASS[split]
    for name, mesh in lib.items():
        for _ in range(n):
            yield name, mesh


def main(root: str | None, epochs: int = 20) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.models import FreezeFlags, PointNet
    from pointcloudprocessing_tpu.train import steps as steps_lib

    if root and os.path.isdir(root):
        print(f"Loading ModelNet meshes from {root}")
        train_pairs = modelnet_meshes(root, "train", CLOUDS_PER_CLASS["train"])
        test_pairs = modelnet_meshes(root, "test", CLOUDS_PER_CLASS["test"])
    else:
        print("No dataset directory found - using the procedural shape library")
        train_pairs = fallback_pairs("train")
        test_pairs = fallback_pairs("test")

    x_train, y_train, label_map = build_arrays(train_pairs, NUM_POINTS, seed=0)
    x_test, y_test, _ = build_arrays(
        test_pairs, NUM_POINTS, seed=1, label_map=label_map
    )
    classes = sorted(label_map, key=label_map.get)
    print(f"{len(classes)} classes, {len(y_train)} train / {len(y_test)} test clouds")

    model = PointNet(num_classes=len(classes), num_parts=1, vanilla=True)
    freeze = FreezeFlags(segmentation_head=True)
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), NUM_POINTS, LearningConfig(rate=1e-3), freeze,
        batch_size=1,
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 0.0, 0.0), freeze, (0.0, 0.0, 0.0)
    )

    batch = 16
    rng = np.random.default_rng(0)
    dummy_parts = np.zeros((batch, NUM_POINTS), np.int32)
    dummy_se3 = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))
    for epoch in range(epochs):
        order = rng.permutation(len(y_train))
        correct = total = 0
        for start in range(0, len(order) - batch + 1, batch):
            idx = order[start : start + batch]
            targets = {
                "classification_output": jnp.asarray(y_train[idx]),
                "segmentation_output": jnp.asarray(dummy_parts),
                "se3": jnp.asarray(dummy_se3),
            }
            state, logs = step(state, jnp.asarray(x_train[idx]), targets, jax.random.key(epoch))
            correct += float(logs["classification_correct"])
            total += float(logs["classification_total"])
        print(f"epoch {epoch + 1}/{epochs} train acc {correct / max(total, 1):.3f}")

    outputs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x_test), train=False,
    )
    pred = np.argmax(np.asarray(outputs["classification_output"]), -1)
    acc = float((pred == y_test).mean())
    print(f"test accuracy: {acc:.3f} over {len(classes)} classes")
    return acc


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else None
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(root, epochs)

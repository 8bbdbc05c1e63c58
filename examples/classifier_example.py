"""Legacy classification-only PointNet walkthrough.

Script equivalent of the reference's ``examples/pointnet_example.ipynb``
(the ModelNet-style Keras-tutorial walkthrough) using the legacy
``PointNetClassifier`` (PointNetClassifier.py:85) on synthetic shape classes
(sphere / cube / cylinder surfaces), plus a ``TNetRegressor`` rotation
pretraining pass (pointnet_train.ipynb cell 10 workflow).

Usage: python examples/classifier_example.py [epochs]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from pointcloudprocessing_tpu.models import PointNetClassifier, TNetRegressor
from pointcloudprocessing_tpu.ops.augment import random_so3_rotation
from pointcloudprocessing_tpu.train.losses import sparse_categorical_crossentropy

N = 128


def make_shapes(batch: int, rng: np.random.Generator):
    """Random sphere/cube/cylinder surface clouds + labels."""
    kinds = rng.integers(0, 3, batch)
    clouds = np.empty((batch, N, 3), np.float32)
    for i, kind in enumerate(kinds):
        if kind == 0:  # sphere
            v = rng.normal(size=(N, 3))
            clouds[i] = v / np.linalg.norm(v, axis=1, keepdims=True)
        elif kind == 1:  # cube surface
            face = rng.integers(0, 3, N)
            sign = rng.choice([-1.0, 1.0], N)
            pts = rng.uniform(-1, 1, (N, 3))
            pts[np.arange(N), face] = sign
            clouds[i] = pts
        else:  # cylinder
            theta = rng.uniform(0, 2 * np.pi, N)
            clouds[i] = np.stack(
                [np.cos(theta), np.sin(theta), rng.uniform(-1, 1, N)], axis=1
            )
    return jnp.asarray(clouds), jnp.asarray(kinds.astype(np.int32))


def train_classifier(epochs: int) -> None:
    rng = np.random.default_rng(0)
    model = PointNetClassifier(num_classes=3)
    x, y = make_shapes(64, rng)
    variables = model.init(jax.random.key(0), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    optimizer = optax.adam(1e-3, eps=1e-7)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, y, key):
        def loss_fn(p):
            probs, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            return jnp.mean(sparse_categorical_crossentropy(probs, y)), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), updates["batch_stats"], opt_state, loss

    for epoch in range(epochs):
        x, y = make_shapes(64, rng)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x, y, jax.random.key(epoch)
        )
        if (epoch + 1) % max(epochs // 5, 1) == 0:
            vx, vy = make_shapes(64, np.random.default_rng(999))
            probs = model.apply(
                {"params": params, "batch_stats": batch_stats}, vx, train=False
            )
            acc = float((jnp.argmax(probs, -1) == vy).mean())
            print(f"epoch {epoch + 1}: loss {float(loss):.3f}  val acc {acc:.2f}")


def pretrain_tnet(epochs: int) -> None:
    """Rotation-regression pretraining of a lone input T-Net."""
    rng = np.random.default_rng(1)
    model = TNetRegressor()
    base, _ = make_shapes(32, rng)
    variables = model.init(jax.random.key(0), base, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    optimizer = optax.adam(1e-3, eps=1e-7)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        rots = random_so3_rotation(key, (32,))
        x = base @ rots
        def loss_fn(p):
            pred, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean((pred - jnp.swapaxes(rots, -1, -2)) ** 2), updates
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), updates["batch_stats"], opt_state, loss

    for epoch in range(epochs):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jax.random.key(epoch)
        )
    print(f"T-Net regressor final MSE: {float(loss):.4f}")


if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print("== PointNetClassifier on synthetic shapes ==")
    train_classifier(epochs)
    print("== TNetRegressor rotation pretraining ==")
    pretrain_tnet(epochs)

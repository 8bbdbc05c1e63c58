"""HyperTune grid-search tests (small grid for speed)."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from pointcloudprocessing_tpu.train.hypertune import HyperTune, run_grid


def _batches(batch=8, width=32, num_classes=3):
    rng = np.random.default_rng(0)

    def make(seed):
        gen = np.random.default_rng(seed)
        x = gen.normal(size=(batch, width, 3)).astype(np.float32)
        cls = gen.integers(0, num_classes, batch).astype(np.int32)
        x[:, :, 0] += cls[:, None] * 3.0
        parts = (x[:, :, 2] > 0).astype(np.int32)
        return jnp.asarray(x), {
            "classification_output": jnp.asarray(cls),
            "segmentation_output": jnp.asarray(parts),
            "se3": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))),
        }

    return make(1), make(2)


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): covered by faster kin + slow lane
def test_run_grid_and_aggregate():
    train_batch, val_batch = _batches()
    results = run_grid(
        train_batch, val_batch,
        num_classes=3, num_parts=2, input_width=32,
        epochs=2, steps_per_epoch=2,
        optimizers={"Adam": lambda lr: optax.adam(lr, eps=1e-7)},
        learning_rates=(1e-3, 1e-2),
        print_func=lambda *_: None,
    )
    assert set(results) == {"Adam 0.001", "Adam 0.01"}
    for history in results.values():
        assert len(history["val_loss"]) == 2
        assert all(np.isfinite(v) for v in history["loss"])

    tune = HyperTune("val_classification_output_sparse_categorical_accuracy")
    tune.add_data({"Model": "m1", **results})
    table = tune.get_table()
    assert "m1" in table and "Adam 0.001" in table["m1"]
    overview = tune.get_overview()
    assert set(overview) == {"Adam 0.001", "Adam 0.01"}
    latex = tune.to_latex()
    assert "\\begin{tabular}" in latex and "Adam 0.001" in latex


def test_overview_averages_across_models():
    tune = HyperTune("score")
    h = {"score": [0.5, 0.8], "val_loss": [1.0, 0.4]}
    tune.add_data({"Model": "a", "Adam 0.001": h})
    tune.add_data({"Model": "b", "Adam 0.001": {"score": [0.2], "val_loss": [2.0]}})
    overview = tune.get_overview()
    assert overview["Adam 0.001"]["score"] == pytest.approx((0.8 + 0.2) / 2)
    assert overview["Adam 0.001"]["val_loss"] == pytest.approx((0.4 + 2.0) / 2)

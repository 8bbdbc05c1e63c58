"""End-to-end serving pipeline tests."""

import numpy as np
import jax
import pytest

from pointcloudprocessing_tpu.models import PointNet
from pointcloudprocessing_tpu.models.pipeline import PointCloudPipeline

B, SCAN_W, MODEL_W, C, P = 2, 128, 64, 5, 3


@pytest.fixture(scope="module")
def pipeline():
    model = PointNet(num_classes=C, num_parts=P, vanilla=True)
    dummy = np.zeros((1, MODEL_W, 3), np.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    return PointCloudPipeline(
        model, variables, scan_width=SCAN_W, model_width=MODEL_W, voxel_size=0.3
    )


def test_single_batch(pipeline, rng):
    scans = rng.uniform(-5, 5, (B, SCAN_W, 3)).astype(np.float32)
    out = pipeline(scans)
    assert out["classification_output"].shape == (B, C)
    assert out["segmentation_output"].shape == (B, MODEL_W, P)
    np.testing.assert_allclose(
        np.asarray(out["classification_output"]).sum(-1), 1.0, atol=1e-5
    )


def test_wrong_width_rejected(pipeline, rng):
    with pytest.raises(ValueError, match="width"):
        pipeline(rng.uniform(-1, 1, (B, SCAN_W + 1, 3)).astype(np.float32))


def test_stream(pipeline, rng):
    batches = [rng.uniform(-5, 5, (B, SCAN_W, 3)).astype(np.float32) for _ in range(5)]
    outputs = list(pipeline.stream(iter(batches)))
    assert len(outputs) == 5
    for out in outputs:
        assert np.isfinite(np.asarray(out["classification_output"])).all()


def test_stream_early_exit(pipeline, rng):
    """Abandoning the stream must not deadlock the producer thread."""
    batches = (rng.uniform(-5, 5, (B, SCAN_W, 3)).astype(np.float32) for _ in range(100))
    gen = pipeline.stream(batches, prefetch=1)
    next(gen)
    gen.close()  # triggers the finally shutdown path

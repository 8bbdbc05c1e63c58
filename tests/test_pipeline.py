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


def test_data_parallel_mesh_matches_single_device(pipeline, rng):
    """Sharded serving (shard_map over a 'data' mesh) must reproduce the
    single-device pipeline bit-for-bit shard by shard: inference has no
    cross-batch coupling, so per-device programs see identical math."""
    from jax.sharding import Mesh
    from pointcloudprocessing_tpu.models.pipeline import PointCloudPipeline
    from pointcloudprocessing_tpu.models import PointNet

    model = PointNet(num_classes=C, num_parts=P, vanilla=True)
    dummy = np.zeros((1, MODEL_W, 3), np.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = PointCloudPipeline(
        model, variables, scan_width=SCAN_W, model_width=MODEL_W,
        voxel_size=0.3, mesh=mesh,
    )
    plain = PointCloudPipeline(
        model, variables, scan_width=SCAN_W, model_width=MODEL_W,
        voxel_size=0.3,
    )
    scans = rng.uniform(-5, 5, (8, SCAN_W, 3)).astype(np.float32)
    out_s = sharded(scans)
    out_p = plain(scans)
    for k in out_p:
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_p[k]), atol=1e-5,
            err_msg=k,
        )


def test_stride_sampler_pipeline(pipeline, rng):
    """The O(n) stride sampler is a valid pipeline configuration."""
    from pointcloudprocessing_tpu.models.pipeline import PointCloudPipeline
    from pointcloudprocessing_tpu.models import PointNet

    model = PointNet(num_classes=C, num_parts=P, vanilla=True)
    dummy = np.zeros((1, MODEL_W, 3), np.float32)
    variables = model.init(jax.random.key(0), dummy, train=False)
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    pipe = PointCloudPipeline(
        model, variables, scan_width=SCAN_W, model_width=MODEL_W,
        voxel_size=0.3, sampler="stride",
    )
    out = pipe(rng.uniform(-5, 5, (B, SCAN_W, 3)).astype(np.float32))
    assert out["classification_output"].shape == (B, C)
    # stride needs the voxel order: configuring it without voxel_size fails
    with pytest.raises(ValueError, match="stride"):
        PointCloudPipeline(
            model, variables, scan_width=SCAN_W, model_width=MODEL_W,
            sampler="stride",
        )

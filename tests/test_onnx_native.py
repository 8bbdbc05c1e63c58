"""Native ONNX export: wire-format round-trip + numerical verification.

No onnxruntime exists in this image (zero egress — PARITY.md), so the
exported graph is executed by the module's own numpy interpreter after a
full protobuf round-trip (writer -> bytes -> reader), and compared against
``model.apply`` at the TF-parity bar (1e-4 on all three heads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessing_tpu.export.onnx_native import (
    export_onnx_native,
    export_onnx_native_dgcnn,
    export_onnx_native_pointnet2,
    parse_model,
    run_onnx,
)
from pointcloudprocessing_tpu.models import PointNet
from pointcloudprocessing_tpu.models.dgcnn import dgcnn_for_width
from pointcloudprocessing_tpu.models.pointnet2 import pointnet2_for_width


@pytest.mark.parametrize("vanilla", [False, True])
def test_onnx_export_matches_jax(tmp_path, rng, vanilla):
    n, b = 64, 3
    model = PointNet(num_classes=5, num_parts=4, vanilla=vanilla)
    x0 = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x0, train=False)
    # non-trivial running stats (fresh init has mean 0 / var 1 everywhere)
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size
        if a.ndim == 1 else a,
        variables,
    )

    path = str(tmp_path / "pointnet.onnx")
    export_onnx_native(model, variables, n, path, print_func=lambda s: None)

    parsed = parse_model(open(path, "rb").read())
    assert parsed["opset"] == 13
    assert parsed["inputs"] == ["points"]
    assert parsed["outputs"] == [
        "classification_output", "segmentation_output", "se3",
    ]

    pts = rng.normal(size=(b, n, 3)).astype(np.float32) * 3.0
    got = run_onnx(parsed, {"points": pts})
    want = model.apply(variables, jnp.asarray(pts), train=False)

    assert got["classification_output"].shape == (b, 5)
    assert got["segmentation_output"].shape == (b, n, 4)
    assert got["se3"].shape == (b, 3, 3)
    for k in ("classification_output", "segmentation_output", "se3"):
        np.testing.assert_allclose(
            got[k], np.asarray(want[k]), atol=1e-4,
            err_msg=f"head {k} (vanilla={vanilla})",
        )


def _nontrivial_stats(variables):
    """Perturb 1-D leaves so folded BN statistics are not the init
    identity (fresh init has mean 0 / var 1 everywhere)."""
    import jax.tree_util as jtu

    return jtu.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size
        if a.ndim == 1 else a,
        variables,
    )


def test_onnx_export_pointnet2_matches_jax(tmp_path, rng):
    """PointNet++ export graph (FPS unrolled, exact TopK kNN, 3-NN
    interpolation) vs model.apply with exact_knn=True — the export side of
    the approx_min_k recall-0.85 trade (VERDICT round-3 item 4)."""
    n, b = 64, 2
    model = pointnet2_for_width(5, 4, n, exact_knn=True)
    x0 = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x0, train=False)
    variables = _nontrivial_stats(variables)

    path = str(tmp_path / "pointnet2.onnx")
    export_onnx_native_pointnet2(
        model, variables, n, path, print_func=lambda s: None
    )

    parsed = parse_model(open(path, "rb").read())
    assert parsed["opset"] == 13
    assert parsed["outputs"] == [
        "classification_output", "segmentation_output", "se3",
    ]

    pts = rng.normal(size=(b, n, 3)).astype(np.float32) * 3.0
    got = run_onnx(parsed, {"points": pts})
    want = model.apply(variables, jnp.asarray(pts), train=False)

    assert got["classification_output"].shape == (b, 5)
    assert got["segmentation_output"].shape == (b, n, 4)
    for k in ("classification_output", "segmentation_output", "se3"):
        np.testing.assert_allclose(
            got[k], np.asarray(want[k]), atol=1e-4, err_msg=f"head {k}"
        )


def test_onnx_export_dgcnn_matches_jax(tmp_path, rng):
    """DGCNN export graph (per-layer dynamic kNN as exact TopK, literal
    edge-tensor dataflow) vs model.apply with exact_knn=True."""
    n, b = 64, 2
    model = dgcnn_for_width(5, 4, n, exact_knn=True)
    x0 = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x0, train=False)
    variables = _nontrivial_stats(variables)

    path = str(tmp_path / "dgcnn.onnx")
    export_onnx_native_dgcnn(
        model, variables, n, path, print_func=lambda s: None
    )

    parsed = parse_model(open(path, "rb").read())
    assert parsed["opset"] == 13
    assert parsed["outputs"] == [
        "classification_output", "segmentation_output", "se3",
    ]

    pts = rng.normal(size=(b, n, 3)).astype(np.float32) * 3.0
    got = run_onnx(parsed, {"points": pts})
    want = model.apply(variables, jnp.asarray(pts), train=False)

    assert got["classification_output"].shape == (b, 5)
    assert got["segmentation_output"].shape == (b, n, 4)
    for k in ("classification_output", "segmentation_output", "se3"):
        np.testing.assert_allclose(
            got[k], np.asarray(want[k]), atol=1e-4, err_msg=f"head {k}"
        )


def test_onnx_export_dgcnn_static_graph_matches_jax(tmp_path, rng):
    """A graph='static' DGCNN (one input-space kNN shared by the trunk —
    the serving opt-in) must export with the SAME shared-TopK semantics:
    verify against model.apply to 1e-4 like the dynamic case. Uses the
    k=10 override so the serving-table config (params.model_options
    {"k": 10, "graph": "static"}, docs/PERF.md) is the exact variant
    covered through export."""
    n, b = 64, 2
    model = dgcnn_for_width(5, 4, n, exact_knn=True, graph="static", k=10)
    x0 = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x0, train=False)
    variables = _nontrivial_stats(variables)

    path = str(tmp_path / "dgcnn_static.onnx")
    export_onnx_native_dgcnn(
        model, variables, n, path, print_func=lambda s: None
    )

    parsed = parse_model(open(path, "rb").read())
    pts = rng.normal(size=(b, n, 3)).astype(np.float32) * 3.0
    got = run_onnx(parsed, {"points": pts})
    want = model.apply(variables, jnp.asarray(pts), train=False)
    for k in ("classification_output", "segmentation_output", "se3"):
        np.testing.assert_allclose(
            got[k], np.asarray(want[k]), atol=1e-4, err_msg=f"head {k}"
        )


def test_onnx_dynamic_batch(tmp_path, rng):
    """The graph must run at batch sizes other than the export-time one."""
    n = 32
    model = PointNet(num_classes=3, num_parts=2, vanilla=True)
    x0 = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x0, train=False)
    path = str(tmp_path / "v.onnx")
    export_onnx_native(model, variables, n, path, print_func=lambda s: None)
    parsed = parse_model(open(path, "rb").read())
    for b in (1, 7):
        pts = rng.normal(size=(b, n, 3)).astype(np.float32)
        got = run_onnx(parsed, {"points": pts})
        want = model.apply(variables, jnp.asarray(pts), train=False)
        np.testing.assert_allclose(
            got["classification_output"],
            np.asarray(want["classification_output"]), atol=1e-4,
        )
        np.testing.assert_allclose(got["se3"], np.asarray(want["se3"]), atol=1e-6)

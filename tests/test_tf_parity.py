"""Logit-parity test against the TF reference implementation.

Builds the reference Keras PointNet (imported live from /root/reference —
nothing copied), transfers its randomly-initialized weights into our flax
PointNet via export.keras_compat, and asserts all three heads agree to 1e-4
in inference mode — the BASELINE.md north-star parity bar.

Skipped when the reference tree or TF is unavailable.
"""

import sys
import types

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference/point_cloud_analysis"


def _stub_plotly():
    if "plotly" not in sys.modules:
        plotly = types.ModuleType("plotly")
        go = types.ModuleType("plotly.graph_objects")
        subplots = types.ModuleType("plotly.subplots")
        subplots.make_subplots = lambda *a, **k: None
        plotly.graph_objects = go
        plotly.subplots = subplots
        sys.modules["plotly"] = plotly
        sys.modules["plotly.graph_objects"] = go
        sys.modules["plotly.subplots"] = subplots


def _import_reference_classifier():
    """Import the reference's LEGACY model module
    (pointnet/PointNetClassifier.py) live, plotting deps stubbed."""
    _stub_plotly()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import pointnet.PointNetClassifier as ref_classifier  # noqa: E402

    return ref_classifier


def _import_reference_pointnet():
    """Import the reference model module with its plotting deps stubbed
    (plotly is not installed here and is irrelevant to the math)."""
    if "plotly" not in sys.modules:
        plotly = types.ModuleType("plotly")
        go = types.ModuleType("plotly.graph_objects")
        subplots = types.ModuleType("plotly.subplots")
        subplots.make_subplots = lambda *a, **k: None
        plotly.graph_objects = go
        plotly.subplots = subplots
        sys.modules["plotly"] = plotly
        sys.modules["plotly.graph_objects"] = go
        sys.modules["plotly.subplots"] = subplots
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import pointnet.PointNet as ref_pointnet  # noqa: E402

    return ref_pointnet


tf = pytest.importorskip("tensorflow")
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not __import__("os").path.isdir(REFERENCE_DIR),
    reason="reference tree not available",
)]

B, N, C, P = 2, 128, 23, 12


@pytest.fixture(scope="module")
def parity_pair():
    import jax

    from pointcloudprocessing_tpu.models import PointNet
    from pointcloudprocessing_tpu.export.keras_compat import (
        flax_variables_from_keras_pointnet,
    )

    ref_mod = _import_reference_pointnet()
    tf.keras.utils.set_random_seed(7)
    keras_model = ref_mod.PointNet(
        classification_output_width=C,
        segmentation_output_width=P,
        dropout_rate=0.3,
        random_seed=7,
        vanilla=False,
        regularize_input_transform=False,
        regularize_feature_transform=False,
    )
    keras_model.build(input_shape=(None, N, 3))
    # The reference TNet.build only creates w/b; the inner conv/dense layers
    # build lazily on first call (PointNet.py:412-416) — trace once.
    keras_model(tf.zeros((1, N, 3)), training=False)

    flax_model = PointNet(num_classes=C, num_parts=P)
    variables = flax_variables_from_keras_pointnet(keras_model, vanilla=False)

    # Sanity: variable tree matches an init tree exactly (same leaves/shapes).
    init_vars = flax_model.init(
        jax.random.key(0), np.zeros((1, 8, 3), np.float32), train=False
    )
    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_vars)
    got_shapes = jax.tree_util.tree_map(
        lambda x: x.shape,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_equal_structs(
        init_shapes["params"], got_shapes["params"]
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, init_shapes, got_shapes)
    )

    return keras_model, flax_model, variables


def test_inference_logit_parity(parity_pair):
    keras_model, flax_model, variables = parity_pair
    rng = np.random.default_rng(123)
    pts = rng.uniform(-4.0, 4.0, (B, N, 3)).astype(np.float32)

    tf_cls, tf_seg, tf_r = keras_model(tf.constant(pts), training=False)
    out = flax_model.apply(variables, pts, train=False)

    np.testing.assert_allclose(
        np.asarray(out["classification_output"]), tf_cls.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["segmentation_output"]), tf_seg.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out["se3"]), tf_r.numpy(), atol=1e-4)


def test_training_mode_parity_batch_stats(parity_pair):
    """Training-mode forward (batch statistics in BN, dropout disabled by
    rate-0 comparison not possible — instead compare the BN-train path by
    running Keras with training=True on a dropout-free submodel: the T-Net."""
    keras_model, flax_model, variables = parity_pair
    rng = np.random.default_rng(5)
    pts = rng.uniform(-2.0, 2.0, (B, N, 3)).astype(np.float32)

    tf_r = keras_model.input_transform(tf.constant(pts), training=True).numpy()

    import jax

    from pointcloudprocessing_tpu.models.tnet import TNet

    tnet = TNet(k=3)
    sub_vars = {
        "params": variables["params"]["input_transform"],
        "batch_stats": variables["batch_stats"]["input_transform"],
    }
    out, _ = tnet.apply(sub_vars, pts, train=True, mutable=["batch_stats"])
    # Train-mode batch statistics accumulate f32 reduction-order noise
    # through the 1024-wide conv; the 1e-4 north-star bar applies to
    # inference (tested above) — allow 5e-4 here.
    np.testing.assert_allclose(np.asarray(out), tf_r, atol=5e-4)


def test_vanilla_parity():
    import jax

    from pointcloudprocessing_tpu.models import PointNet
    from pointcloudprocessing_tpu.export.keras_compat import (
        flax_variables_from_keras_pointnet,
    )

    ref_mod = _import_reference_pointnet()
    tf.keras.utils.set_random_seed(11)
    keras_model = ref_mod.PointNet(
        classification_output_width=C,
        segmentation_output_width=P,
        dropout_rate=0.3,
        random_seed=11,
        vanilla=True,
    )
    keras_model.build(input_shape=(None, N, 3))
    keras_model(tf.zeros((1, N, 3)), training=False)

    flax_model = PointNet(num_classes=C, num_parts=P, vanilla=True)
    variables = flax_variables_from_keras_pointnet(keras_model, vanilla=True)

    rng = np.random.default_rng(17)
    pts = rng.uniform(-4.0, 4.0, (B, N, 3)).astype(np.float32)
    tf_cls, tf_seg, tf_r = keras_model(tf.constant(pts), training=False)
    out = flax_model.apply(variables, pts, train=False)
    np.testing.assert_allclose(
        np.asarray(out["classification_output"]), tf_cls.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["segmentation_output"]), tf_seg.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out["se3"]), tf_r.numpy(), atol=1e-4)


def test_legacy_classifier_parity():
    """Legacy-family pin (VERDICT round-3 item 2): the reference
    ``PointNetClassifier`` (PointNetClassifier.py:85) has deliberately
    different conventions from the current model — zero-initialized
    transform ``w`` (:292), ``padding='valid'`` (:349), T-Net convs without
    BN or activation (:283-285). Transfer live Keras weights and hold the
    softmax output to the same 1e-4 bar.

    A freshly-initialized legacy T-Net is exactly the identity (w is zeros,
    b is identity), so to also exercise the w path the Keras weights are
    perturbed to random values before transfer.
    """
    from pointcloudprocessing_tpu.models.classifier import PointNetClassifier
    from pointcloudprocessing_tpu.export.keras_compat import (
        flax_variables_from_keras_classifier,
    )

    ref_mod = _import_reference_classifier()
    tf.keras.utils.set_random_seed(3)
    keras_model = ref_mod.PointNetClassifier(output_width=C)
    keras_model.build(input_shape=(None, N, 3))
    keras_model(tf.zeros((1, N, 3)), training=False)

    # exercise the zero-init w path AND a nontrivial transform: randomize
    # every weight (incl. w/b and BN stats) the way a trained model would be
    rng = np.random.default_rng(29)
    for v in keras_model.weights:
        shape = v.shape.as_list()
        if v.name.endswith("moving_variance") or "variance" in v.name:
            v.assign(rng.uniform(0.5, 2.0, shape).astype(np.float32))
        else:
            v.assign(rng.normal(0.0, 0.05, shape).astype(np.float32))

    flax_model = PointNetClassifier(num_classes=C)
    variables = flax_variables_from_keras_classifier(keras_model)

    pts = rng.uniform(-4.0, 4.0, (B, N, 3)).astype(np.float32)
    tf_out = keras_model(tf.constant(pts), training=False).numpy()
    out = flax_model.apply(variables, pts, train=False)
    np.testing.assert_allclose(np.asarray(out), tf_out, atol=1e-4)


def test_legacy_classifier_parity_fresh_init():
    """Same pin at the reference's actual initialization (zero w, identity
    b, Glorot convs WITH bias since apply_bn=False in the legacy T-Net) —
    catches convention bugs the randomized test could mask."""
    from pointcloudprocessing_tpu.models.classifier import PointNetClassifier
    from pointcloudprocessing_tpu.export.keras_compat import (
        flax_variables_from_keras_classifier,
    )

    ref_mod = _import_reference_classifier()
    tf.keras.utils.set_random_seed(13)
    keras_model = ref_mod.PointNetClassifier(output_width=C)
    keras_model.build(input_shape=(None, N, 3))
    keras_model(tf.zeros((1, N, 3)), training=False)

    flax_model = PointNetClassifier(num_classes=C)
    variables = flax_variables_from_keras_classifier(keras_model)

    rng = np.random.default_rng(31)
    pts = rng.uniform(-4.0, 4.0, (B, N, 3)).astype(np.float32)
    tf_out = keras_model(tf.constant(pts), training=False).numpy()
    out = flax_model.apply(variables, pts, train=False)
    np.testing.assert_allclose(np.asarray(out), tf_out, atol=1e-4)


def test_legacy_tnet_regressor_parity():
    """``TNetRegressor`` (PointNetClassifier.py:188) DCM-output parity at
    1e-4 with live-transferred weights (randomized as in the classifier
    test so the zero-init w contributes)."""
    from pointcloudprocessing_tpu.models.classifier import TNetRegressor
    from pointcloudprocessing_tpu.export.keras_compat import (
        flax_variables_from_keras_tnet_regressor,
    )

    ref_mod = _import_reference_classifier()
    tf.keras.utils.set_random_seed(19)
    keras_model = ref_mod.TNetRegressor(add_regularization=True)
    keras_model.build(input_shape=(None, N, 3))
    keras_model(tf.zeros((1, N, 3)), training=False)

    rng = np.random.default_rng(37)
    for v in keras_model.weights:
        shape = v.shape.as_list()
        if "variance" in v.name:
            v.assign(rng.uniform(0.5, 2.0, shape).astype(np.float32))
        else:
            v.assign(rng.normal(0.0, 0.05, shape).astype(np.float32))

    flax_model = TNetRegressor(add_regularization=True)
    variables = flax_variables_from_keras_tnet_regressor(keras_model)

    pts = rng.uniform(-2.0, 2.0, (B, N, 3)).astype(np.float32)
    tf_dcm = keras_model(tf.constant(pts), training=False).numpy()
    out = flax_model.apply(variables, pts, train=False)
    np.testing.assert_allclose(np.asarray(out), tf_dcm, atol=1e-4)

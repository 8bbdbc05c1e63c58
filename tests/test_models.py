"""Shape/semantics tests for the Flax PointNet family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudprocessing_tpu.models import (
    PointNet,
    PointNetClassifier,
    TNetRegressor,
    TNet,
    FreezeFlags,
    NOTHING_FROZEN,
    layer_trainability,
)


B, N, C, P = 2, 64, 23, 12


@pytest.fixture(scope="module")
def pointnet_setup():
    model = PointNet(num_classes=C, num_parts=P)
    pts = jax.random.normal(jax.random.key(0), (B, N, 3))
    variables = model.init(jax.random.key(1), pts, train=False)
    return model, variables, pts


def test_forward_shapes(pointnet_setup):
    model, variables, pts = pointnet_setup
    out = model.apply(variables, pts, train=False)
    assert out["classification_output"].shape == (B, C)
    assert out["segmentation_output"].shape == (B, N, P)
    assert out["se3"].shape == (B, 3, 3)


def test_outputs_are_probabilities(pointnet_setup):
    model, variables, pts = pointnet_setup
    out = model.apply(variables, pts, train=False)
    np.testing.assert_allclose(
        np.asarray(out["classification_output"]).sum(-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["segmentation_output"]).sum(-1), 1.0, atol=1e-5
    )


def test_untrained_tnet_is_near_identity():
    """b is identity-initialized; with glorot w the transform starts near b.

    (Exact identity for the legacy zero-init TNet, tested below.)"""
    model = TNetRegressor()
    pts = jax.random.normal(jax.random.key(0), (B, N, 3))
    variables = model.init(jax.random.key(1), pts, train=False)
    out = model.apply(variables, pts, train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.eye(3), (B, 3, 3)), atol=1e-6
    )


def test_permutation_invariance(pointnet_setup):
    """Global max-pool makes classification permutation-invariant and
    segmentation equivariant."""
    model, variables, pts = pointnet_setup
    perm = jax.random.permutation(jax.random.key(3), N)
    out1 = model.apply(variables, pts, train=False)
    out2 = model.apply(variables, pts[:, perm], train=False)
    np.testing.assert_allclose(
        np.asarray(out1["classification_output"]),
        np.asarray(out2["classification_output"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out1["segmentation_output"][:, perm]),
        np.asarray(out2["segmentation_output"]),
        atol=1e-5,
    )


def test_translation_scale_invariance(pointnet_setup):
    """Input normalization (unit sphere) makes the model invariant to rigid
    translation and uniform scaling of the input cloud."""
    model, variables, pts = pointnet_setup
    out1 = model.apply(variables, pts, train=False)
    out2 = model.apply(variables, pts * 3.0 + jnp.array([10.0, -5.0, 2.0]), train=False)
    np.testing.assert_allclose(
        np.asarray(out1["classification_output"]),
        np.asarray(out2["classification_output"]),
        atol=1e-4,
    )


def test_vanilla_identity_rotation():
    model = PointNet(num_classes=C, num_parts=P, vanilla=True)
    pts = jax.random.normal(jax.random.key(0), (B, N, 3))
    variables = model.init(jax.random.key(1), pts, train=False)
    out = model.apply(variables, pts, train=False)
    np.testing.assert_array_equal(
        np.asarray(out["se3"]), np.broadcast_to(np.eye(3), (B, 3, 3))
    )
    # No T-Net params exist in vanilla mode.
    assert "input_transform" not in variables["params"]
    assert "feature_transform" not in variables["params"]


def test_regularization_losses_sown():
    model = PointNet(
        num_classes=C,
        num_parts=P,
        regularize_input_transform=True,
        regularize_feature_transform=True,
    )
    pts = jax.random.normal(jax.random.key(0), (B, N, 3))
    variables = model.init(jax.random.key(1), pts, train=False)
    # The train step passes only params/batch_stats (sown collections from
    # init must not be re-fed or they accumulate).
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    out, aux = model.apply(
        variables, pts, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats", "reg_losses"],
    )
    flat = jax.tree_util.tree_leaves(aux["reg_losses"])
    assert len(flat) == 2  # both T-Nets contributed
    assert all(float(v) >= 0 for v in flat)


def test_no_regularization_by_default(pointnet_setup):
    model, variables, pts = pointnet_setup
    out, aux = model.apply(
        variables, pts, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats", "reg_losses"],
    )
    assert not jax.tree_util.tree_leaves(aux.get("reg_losses", {}))


def test_frozen_bn_uses_running_stats(pointnet_setup):
    """Freezing everything must make train-mode output equal eval output
    (Keras trainable=False semantics) up to dropout — so compare with
    dropout disabled via the same rng... dropout still fires in Keras when
    frozen, so here we only check batch_stats are NOT updated."""
    model, variables, pts = pointnet_setup
    all_frozen = FreezeFlags(True, True, True, True)
    _, aux = model.apply(
        variables, pts, train=True, freeze=all_frozen,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    # batch_stats unchanged when every block is frozen
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(aux["batch_stats"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_unfrozen_bn_updates_stats(pointnet_setup):
    model, variables, pts = pointnet_setup
    _, aux = model.apply(
        variables, pts, train=True, freeze=NOTHING_FROZEN,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    before = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(variables["batch_stats"])]
    )
    after = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(aux["batch_stats"])]
    )
    assert not np.array_equal(before, after)


def test_partial_freeze_only_updates_thawed_stats(pointnet_setup):
    model, variables, pts = pointnet_setup
    freeze = FreezeFlags(
        input_transform=False,
        shared_network=False,
        classification_head=True,
        segmentation_head=False,
    )
    _, aux = model.apply(
        variables, pts, train=True, freeze=freeze,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    for name in ["mlp_cls_1", "mlp_cls_2"]:
        before = variables["batch_stats"][name]["bn"]["mean"]
        after = aux["batch_stats"][name]["bn"]["mean"]
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    before = variables["batch_stats"]["mlp_1_1"]["bn"]["mean"]
    after = aux["batch_stats"]["mlp_1_1"]["bn"]["mean"]
    assert not np.array_equal(np.asarray(before), np.asarray(after))


def test_classifier_shapes():
    model = PointNetClassifier(num_classes=10)
    pts = jax.random.normal(jax.random.key(0), (B, N, 3))
    variables = model.init(jax.random.key(1), pts, train=False)
    out = model.apply(variables, pts, train=False)
    assert out.shape == (B, 10)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_layer_trainability_report():
    report = layer_trainability(
        FreezeFlags(input_transform=False, shared_network=True,
                    classification_head=False, segmentation_head=True),
        vanilla=False,
    )
    assert report["input_transform"] is True          # override order honored
    assert report["feature_transform"] is False       # follows shared_network
    assert report["s1_l1_64_convolution_layer"] is False
    assert report["s3_l1_512_dense_layer"] is True
    assert report["seg_l5_output_convolution_layer"] is False
    # vanilla report omits the transforms
    v = layer_trainability(NOTHING_FROZEN, vanilla=True)
    assert "input_transform" not in v


def test_param_count_full_model():
    """Reference full model is ~3.5M params (SURVEY §6, derived from layer
    widths); sanity-check ours lands in that neighborhood."""
    model = PointNet(num_classes=23, num_parts=12)
    pts = jnp.zeros((1, 32, 3))
    variables = model.init(jax.random.key(0), pts, train=False)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    # ~4.2M trainable params (the TF-vs-flax parity test asserts the exact
    # per-layer shape match; SURVEY §6's "~3.5M" was a rough derivation).
    assert 3.0e6 < n_params < 5.0e6


def test_heads_subset_matches_full():
    """apply(heads=subset) must produce identical values to the full pass
    (same params; the subset only skips unrequested compute)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pointcloudprocessing_tpu.models import PointNet

    model = PointNet(num_classes=5, num_parts=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    full = model.apply(variables, x, train=False)
    cls_only = model.apply(
        variables, x, train=False, heads=("classification_output", "se3")
    )
    assert set(cls_only) == {"classification_output", "se3"}
    np.testing.assert_array_equal(
        np.asarray(cls_only["classification_output"]),
        np.asarray(full["classification_output"]),
    )
    np.testing.assert_array_equal(
        np.asarray(cls_only["se3"]), np.asarray(full["se3"])
    )
    seg_only = model.apply(variables, x, train=False, heads=("segmentation_output",))
    assert set(seg_only) == {"segmentation_output"}
    np.testing.assert_array_equal(
        np.asarray(seg_only["segmentation_output"]),
        np.asarray(full["segmentation_output"]),
    )

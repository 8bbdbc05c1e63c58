"""PointNet++ family tests: grouping ops vs numpy, head contract, freeze
masks through the optimizer, and the training-driver integration.

The reference repo has no PointNet++ — this family is beyond-reference
surface (models/pointnet2.py) built on the framework's own FPS/kNN ops, so
these tests pin OUR semantics rather than parity."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessing_tpu.models import FreezeFlags, PointNet2
from pointcloudprocessing_tpu.models.pointnet2 import (
    interpolate_features,
    pointnet2_for_width,
    sample_and_group,
)

TINY = dict(
    sa1=(16, 8, 0.5, (8, 16)),
    sa2=(8, 8, 0.9, (16, 32)),
    sa3_mlp=(32, 64),
    exact_knn=True,
)


def _cloud(b=2, n=64, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, n, 3)).astype(np.float32)
    )


def test_forward_contract():
    """Output dict matches the PointNet head contract: shapes, softmax rows,
    identity se3, and heads subsetting skipping the seg decoder."""
    model = PointNet2(num_classes=5, num_parts=4, **TINY)
    x = _cloud()
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), x
    )
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out["classification_output"].shape == (2, 5)
    assert out["segmentation_output"].shape == (2, 64, 4)
    assert out["se3"].shape == (2, 3, 3)
    np.testing.assert_allclose(
        np.sum(out["classification_output"], -1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.sum(out["segmentation_output"], -1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(out["se3"], np.eye(3)[None].repeat(2, 0))

    subset = jax.jit(
        lambda v, x: model.apply(
            v, x, train=False, heads=("classification_output",)
        )
    )(variables, x)
    assert set(subset) == {"classification_output"}
    np.testing.assert_allclose(
        subset["classification_output"], out["classification_output"],
        rtol=1e-6,
    )


def test_sample_and_group_semantics():
    """Grouped output = neighbor coords centered on FPS centroids, with
    out-of-radius slots duplicating the nearest neighbor — checked against
    a direct numpy reconstruction."""
    x = _cloud(b=1, n=32, seed=3)
    radius = 0.6
    new_xyz, grouped = jax.jit(
        lambda x: sample_and_group(x, None, 8, 6, radius, exact_knn=True)
    )(x)
    assert new_xyz.shape == (1, 8, 3)
    assert grouped.shape == (1, 8, 6, 3)

    pts = np.asarray(x[0])
    for q in range(8):
        c = np.asarray(new_xyz[0, q])
        d = np.sum((pts - c) ** 2, -1)
        order = np.argsort(d, kind="stable")[:6]
        expect = pts[order]
        within = d[order] <= radius * radius
        expect[~within] = expect[0]  # nearest-neighbor duplicate padding
        np.testing.assert_allclose(
            np.asarray(grouped[0, q]), expect - c, rtol=1e-5, atol=1e-5
        )


def test_interpolate_features_matches_numpy():
    fine = _cloud(b=1, n=20, seed=5)
    coarse = _cloud(b=1, n=6, seed=6)
    feats = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 6, 4)).astype(np.float32)
    )
    got = jax.jit(interpolate_features)(fine, coarse, feats)
    f, c, ft = (np.asarray(a[0]) for a in (fine, coarse, feats))
    for i in range(20):
        d = np.sum((c - f[i]) ** 2, -1)
        idx = np.argsort(d)[:3]
        w = 1.0 / (d[idx] + 1e-8)
        w = w / w.sum()
        np.testing.assert_allclose(
            np.asarray(got[0, i]), (ft[idx] * w[:, None]).sum(0),
            rtol=1e-4, atol=1e-5,
        )


def test_freeze_masks_through_optimizer():
    """The classification-pretrain stage freeze must leave every mlp_seg_*
    param untouched after an optimizer step while the trunk and cls head
    move — the same freeze_label_tree machinery as the PointNet family."""
    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.train import steps as steps_lib

    model = PointNet2(num_classes=3, num_parts=4, **TINY)
    freeze = FreezeFlags(segmentation_head=True)
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), 64, LearningConfig(rate=1e-2), freeze,
        batch_size=2,
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 0.0, 0.0), freeze, (0.0, 0.0, 0.0)
    )
    x = _cloud(b=2, n=64, seed=1)
    targets = {
        "classification_output": jnp.array([0, 2], jnp.int32),
        "segmentation_output": jnp.zeros((2, 64), jnp.int32),
        "se3": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    old_params = jax.device_get(state.params)  # the step donates state
    new_state, logs = step(state, x, targets, jax.random.key(2))
    assert np.isfinite(float(logs["loss"]))

    moved, held = [], []
    flat_old = jax.tree_util.tree_flatten_with_path(old_params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(new_state.params)[0])
    for path, old in flat_old:
        top = path[0].key
        changed = bool(np.any(np.asarray(old) != np.asarray(flat_new[path])))
        (held if top.startswith("mlp_seg") else moved).append((top, changed))
    assert all(not c for _, c in held), [t for t, c in held if c]
    assert any(c for _, c in moved)


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): covered by faster kin + slow lane
def test_train_profile_pointnet2_e2e(tmp_path, monkeypatch):
    """Full driver run with params.model='pointnet2': both stages train,
    history has the exact Keras keys, checkpoints + StableHLO land, and the
    ONNX gate degrades with the family advisory."""
    from test_train_profile import make_config
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    config_path = make_config(tmp_path, epochs=2)
    with open(config_path) as f:
        cfg = json.load(f)
    cfg["params"]["model"] = "pointnet2"
    with open(config_path, "w") as f:
        json.dump(cfg, f)

    tp = TrainProfile(config_path, log_to_file=False)
    tp.steps_per_dispatch = 2
    histories = tp.train()
    assert set(histories) == {"classification_pretrain", "final"}
    h = histories["final"]
    assert len(h["loss"]) == 2
    assert all(np.isfinite(v) for v in h["loss"])
    stage_dir = tmp_path / "models" / "tiny" / "final"
    assert (stage_dir / "best").is_dir()
    assert (stage_dir / "tiny_final.stablehlo").exists()
    assert (stage_dir / "tiny_final.onnx").exists()


def test_bf16_mode_runs():
    model = PointNet2(num_classes=3, num_parts=4, dtype=jnp.bfloat16, **TINY)
    x = _cloud()
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), x
    )
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    # heads stay f32 regardless of trunk dtype
    assert out["classification_output"].dtype == jnp.float32
    assert out["segmentation_output"].dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out["segmentation_output"])))


def test_for_width_clamps():
    m = pointnet2_for_width(3, 4, 32)
    assert m.sa1[0] <= 16 and m.sa1[1] <= 32
    assert m.sa2[0] >= 4
    canonical = pointnet2_for_width(3, 4, 1024)
    assert canonical.sa1[:3] == (512, 32, 0.2)
    assert canonical.sa2[:3] == (128, 64, 0.4)

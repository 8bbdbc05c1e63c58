"""ICP registration tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloudprocessing_tpu.ops.icp import icp
from pointcloudprocessing_tpu.toolkit import mat_ops as tk_mat_ops


def test_icp_recovers_small_transform(rng):
    target = rng.uniform(-2, 2, (400, 3)).astype(np.float32)
    r_true = tk_mat_ops.get_dcm(4.0, -3.0, 6.0)
    t_true = np.array([0.1, -0.05, 0.2], np.float32)
    # source is the target moved by the inverse transform
    source = ((target - t_true) @ r_true).astype(np.float32)

    r, t, rmse = icp(jnp.asarray(source), jnp.asarray(target), iterations=30)
    moved = source @ np.asarray(r).T + np.asarray(t)
    # registered cloud lands on the target
    err = np.linalg.norm(moved - target, axis=1)
    assert np.median(err) < 0.05
    assert float(rmse) < 0.1


def test_icp_identity_when_aligned(rng):
    cloud = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    r, t, rmse = icp(jnp.asarray(cloud), jnp.asarray(cloud), iterations=5)
    np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-4)
    assert float(rmse) < 1e-4

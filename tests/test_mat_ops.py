"""Golden tests for ops.mat_ops vs independent numpy implementations.

The numpy goldens here re-derive the math from the definitions (premultiplied
elementary rotations, SVD Kabsch) rather than importing the reference code;
behavioral parity targets are cited in the op docstrings.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloudprocessing_tpu.ops import mat_ops


def np_yaw(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def np_pitch(p):
    c, s = np.cos(p), np.sin(p)
    return np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])


def np_roll(r):
    c, s = np.cos(r), np.sin(r)
    return np.array([[1.0, 0.0, 0.0], [0.0, c, s], [0.0, -s, c]])


def np_get_dcm(roll_deg, pitch_deg, yaw_deg):
    m = (
        np_roll(np.deg2rad(roll_deg))
        @ np_pitch(np.deg2rad(pitch_deg))
        @ np_yaw(np.deg2rad(yaw_deg))
        @ np.eye(3)
    )
    return m.T


@pytest.mark.parametrize(
    "rpy", [(0.0, 0.0, 0.0), (10.0, -20.0, 30.0), (-90.0, 45.0, 180.0), (33.3, 12.1, -171.0)]
)
def test_get_dcm_matches_numpy(rpy):
    got = np.asarray(mat_ops.get_dcm(*rpy))
    want = np_get_dcm(*rpy)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # DCM is orthogonal with det +1
    np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(got) == pytest.approx(1.0, abs=1e-6)


def test_euler_roundtrip():
    rpy = (12.0, -34.0, 56.0)
    dcm = mat_ops.get_dcm(*rpy)
    # get_roll_pitch_yaw_deg extracts from the body-to-world transpose
    # convention used by the reference: feed dcm.T
    angles = mat_ops.get_roll_pitch_yaw_deg(jnp.swapaxes(dcm, -1, -2))
    assert float(angles["roll"]) == pytest.approx(12.0, abs=1e-4)
    assert float(angles["pitch"]) == pytest.approx(-34.0, abs=1e-4)
    assert float(angles["yaw"]) == pytest.approx(56.0, abs=1e-4)


def test_look_at_origin_points_at_origin(rng):
    for _ in range(5):
        pos = rng.uniform(-10, 10, 3)
        dcm = np.asarray(mat_ops.get_dcm_positive_x_pointing_at_origin(pos))
        # +x body axis expressed in world frame must point from pos toward origin.
        x_axis_world = dcm[0]
        want = -pos / np.linalg.norm(pos)
        np.testing.assert_allclose(x_axis_world, want, atol=1e-5)
        np.testing.assert_allclose(dcm @ dcm.T, np.eye(3), atol=1e-5)


def test_reorthogonalize(rng):
    noisy = np_get_dcm(10, 20, 30) + rng.normal(0, 0.01, (3, 3))
    fixed = np.asarray(mat_ops.reorthogonalize(noisy))
    np.testing.assert_allclose(fixed @ fixed.T, np.eye(3), atol=1e-6)


def test_convert_radar_to_global_straight_ahead():
    # Radar at origin, no rotation: range 10 at az 0, el 0 -> (10, 0, 0)
    p = np.asarray(
        mat_ops.convert_radar_to_global(
            jnp.array([10.0, 0.0, 0.0]), jnp.zeros(3), jnp.zeros(3)
        )
    )
    np.testing.assert_allclose(p, [10.0, 0.0, 0.0], atol=1e-5)
    # Elevation 90 -> straight up
    p = np.asarray(
        mat_ops.convert_radar_to_global(
            jnp.array([5.0, 0.0, 90.0]), jnp.zeros(3), jnp.zeros(3)
        )
    )
    np.testing.assert_allclose(p, [0.0, 0.0, 5.0], atol=1e-5)


def test_convert_radar_translation_offset():
    p = np.asarray(
        mat_ops.convert_radar_to_global(
            jnp.array([10.0, 90.0, 0.0]), jnp.array([1.0, 2.0, 3.0]), jnp.zeros(3)
        )
    )
    np.testing.assert_allclose(p, [1.0, 12.0, 3.0], atol=1e-4)


def test_kabsch_recovers_known_transform(rng):
    r_true = np_get_dcm(14.0, -25.0, 40.0)
    t_true = np.array([1.0, -2.0, 0.5])
    measured = rng.uniform(-5, 5, (50, 3))
    truth = measured @ r_true.T + t_true

    r, t, rmse = mat_ops.solve_kabsch(truth, measured)
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)
    assert float(rmse) < 1e-5


def test_kabsch_reflection_fix():
    # Degenerate planar correspondence that would produce det=-1 without the
    # reflection fix of calibration.py:22-24.
    measured = np.array([[1.0, 0, 0], [0, 1.0, 0], [-1.0, 0, 0], [0, -1.0, 0]])
    truth = measured.copy()
    truth[:, 2] = 0.0
    truth = truth @ np.diag([1.0, -1.0, 1.0])  # mirrored
    r, t, rmse = mat_ops.solve_kabsch(truth, measured)
    assert np.linalg.det(np.asarray(r)) == pytest.approx(1.0, abs=1e-5)


def test_relative_pose():
    rs = np_get_dcm(0, 0, 90.0)
    sensor = np.eye(4)
    sensor[:3, :3] = rs
    sensor[:3, 3] = [1.0, 0.0, 0.0]
    target = np.eye(4)
    target[:3, 3] = [2.0, 0.0, 0.0]

    rel = np.asarray(mat_ops.relative_pose(sensor, target))
    # Same construction as PointCloudSet._parse_state_info:503-507.
    want_r = rs.T @ np.eye(3)
    want_t = rs.T @ (target[:3, 3] - sensor[:3, 3])
    np.testing.assert_allclose(rel[:3, :3], want_r, atol=1e-6)
    np.testing.assert_allclose(rel[:3, 3], want_t, atol=1e-6)
    np.testing.assert_allclose(rel[3], [0, 0, 0, 1], atol=0)

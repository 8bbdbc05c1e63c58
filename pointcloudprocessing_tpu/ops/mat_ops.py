"""SO(3)/SE(3) math as pure jax.numpy (jit/vmap/grad-compatible).

Functional parity targets (all verified by golden tests vs independent numpy):

- yaw/pitch/roll premultiply chain, ``get_dcm``, ``get_roll_pitch_yaw_deg``,
  ``get_DCM_positive_x_pointing_at_origin``, ``reorthogonalize``,
  ``convert_radar_to_global``: reference
  ``point_cloud_analysis/utils/mat_ops.py:6-102``.
- ``solve_kabsch``: reference ``point_cloud_toolkit/utils/calibration.py:3-31``.

Unlike the reference (two diverging numpy copies of this module), this is the
single shared implementation; every function accepts batched inputs where
that makes sense and stays inside an XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Coordinate-bearing matmuls below are pinned to f32-exact precision: TPU's
# default single-bf16-pass matmul carries ~4e-3 relative error — calibration
# (Kabsch), frame composition, and radar->global conversion all feed mm-to-
# cm-scale downstream math that cannot absorb it. Every contraction here has
# depth 3, so the exact passes cost nothing measurable.


def yaw_matrix(yaw_rad) -> jnp.ndarray:
    """Rotation about +z. Reference: utils/mat_ops.py:6-12 (`_yaw`)."""
    c, s = jnp.cos(yaw_rad), jnp.sin(yaw_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, s, z], axis=-1),
            jnp.stack([-s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def pitch_matrix(pitch_rad) -> jnp.ndarray:
    """Rotation about +y. Reference: utils/mat_ops.py:14-20 (`_pitch`)."""
    c, s = jnp.cos(pitch_rad), jnp.sin(pitch_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, -s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([s, z, c], axis=-1),
        ],
        axis=-2,
    )


def roll_matrix(roll_rad) -> jnp.ndarray:
    """Rotation about +x. Reference: utils/mat_ops.py:22-28 (`_roll`)."""
    c, s = jnp.cos(roll_rad), jnp.sin(roll_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, s], axis=-1),
            jnp.stack([z, -s, c], axis=-1),
        ],
        axis=-2,
    )


@jax.default_matmul_precision("highest")
def apply_yaw(dcm: jnp.ndarray, yaw_rad) -> jnp.ndarray:
    return yaw_matrix(yaw_rad) @ dcm


@jax.default_matmul_precision("highest")
def apply_pitch(dcm: jnp.ndarray, pitch_rad) -> jnp.ndarray:
    return pitch_matrix(pitch_rad) @ dcm


@jax.default_matmul_precision("highest")
def apply_roll(dcm: jnp.ndarray, roll_rad) -> jnp.ndarray:
    return roll_matrix(roll_rad) @ dcm


def get_dcm(roll_deg, pitch_deg, yaw_deg) -> jnp.ndarray:
    """Body-to-world DCM from roll/pitch/yaw degrees.

    Reference: utils/mat_ops.py:38-39 — roll(pitch(yaw(I))).T with
    premultiplied elementary rotations.
    """
    m = apply_roll(
        apply_pitch(
            apply_yaw(jnp.eye(3, dtype=jnp.result_type(float)), jnp.deg2rad(yaw_deg)),
            jnp.deg2rad(pitch_deg),
        ),
        jnp.deg2rad(roll_deg),
    )
    return jnp.swapaxes(m, -1, -2)


def get_roll_pitch_yaw_deg(dcm: jnp.ndarray) -> dict:
    """Euler extraction. Reference: utils/mat_ops.py:30-36."""
    yaw = jnp.arctan2(dcm[..., 0, 1], dcm[..., 0, 0])
    pitch = -jnp.arcsin(dcm[..., 0, 2])
    roll = jnp.arctan2(dcm[..., 1, 2], dcm[..., 2, 2])
    return {
        "roll": jnp.rad2deg(roll),
        "pitch": jnp.rad2deg(pitch),
        "yaw": jnp.rad2deg(yaw),
    }


def get_dcm_positive_x_pointing_at_origin(pos: jnp.ndarray, roll_deg=0.0) -> jnp.ndarray:
    """DCM for a camera at ``pos`` with +x pointing at the origin.

    Reference: utils/mat_ops.py:41-61 (the runtime orthogonality asserts are
    replaced by construction — the chain of elementary rotations is orthogonal
    by definition).
    """
    pos = jnp.asarray(pos)
    pitch_rad = jnp.arctan2(pos[..., 2], jnp.sqrt(pos[..., 0] ** 2 + pos[..., 1] ** 2))
    yaw_rad = jnp.pi + jnp.arctan2(pos[..., 1], pos[..., 0])
    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=pos.dtype), (*pos.shape[:-1], 3, 3)
    )
    dcm = apply_yaw(eye, yaw_rad)
    dcm = apply_pitch(dcm, pitch_rad)
    dcm = apply_roll(dcm, jnp.deg2rad(jnp.asarray(roll_deg, dtype=pos.dtype)))
    return dcm


@jax.default_matmul_precision("highest")
def reorthogonalize(dcm: jnp.ndarray) -> jnp.ndarray:
    """Nearest orthogonal matrix via SVD. Reference: utils/mat_ops.py:63-65."""
    u, _, vt = jnp.linalg.svd(dcm)
    return u @ vt


@jax.default_matmul_precision("highest")
def convert_radar_to_global(
    rg_az_el: jnp.ndarray, radar_pos: jnp.ndarray, radar_rpy: jnp.ndarray
) -> jnp.ndarray:
    """Spherical radar return -> global cartesian point.

    Reference: utils/mat_ops.py:92-102. ``rg_az_el`` is (range_m, azimuth_deg,
    elevation_deg); ``radar_rpy`` is (roll, pitch, yaw) in degrees. Supports a
    leading batch axis on ``rg_az_el``.
    """
    rg_az_el = jnp.asarray(rg_az_el, dtype=jnp.result_type(float))
    g_r_r = get_dcm(radar_rpy[0], radar_rpy[1], radar_rpy[2])
    rng = rg_az_el[..., 0]
    az = jnp.deg2rad(rg_az_el[..., 1])
    polar = jnp.deg2rad(90.0 - rg_az_el[..., 2])
    point = jnp.stack(
        [
            rng * jnp.cos(az) * jnp.sin(polar),
            rng * jnp.sin(az) * jnp.sin(polar),
            rng * jnp.cos(polar),
        ],
        axis=-1,
    )
    return point @ g_r_r.T + jnp.asarray(radar_pos)


@jax.default_matmul_precision("highest")
def solve_kabsch(truth_vecs: jnp.ndarray, measured_vecs: jnp.ndarray):
    """Kabsch rigid alignment: find (R, t) minimizing ||R@measured + t - truth||.

    Reference: point_cloud_toolkit/utils/calibration.py:3-31 (SVD of the
    centered cross-covariance, det-based reflection fix, RMSE report).

    Returns (R (3,3), t (3,), rmse (scalar)).
    """
    truth_vecs = jnp.asarray(truth_vecs, dtype=jnp.result_type(float))
    measured_vecs = jnp.asarray(measured_vecs, dtype=truth_vecs.dtype)

    truth_mean = jnp.mean(truth_vecs, axis=0)
    meas_mean = jnp.mean(measured_vecs, axis=0)
    h = (measured_vecs - meas_mean).T @ (truth_vecs - truth_mean)

    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(vt.T @ u.T)
    # Flip the last row of Vt when the proper rotation requires it (data-
    # independent shape; lax.cond-free select keeps this jit-friendly).
    flip = jnp.where(det < 0, -1.0, 1.0)
    vt = vt.at[2, :].multiply(flip)
    r = vt.T @ u.T

    t = truth_mean - r @ meas_mean
    aligned = measured_vecs @ r.T + t
    rmse = jnp.sqrt(jnp.mean(jnp.sum((aligned - truth_vecs) ** 2, axis=1)))
    return r, t, rmse


def se3_compose(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Pack (R, t) into a 4x4 SE(3) matrix (batched)."""
    rotation = jnp.asarray(rotation)
    translation = jnp.asarray(translation)
    batch = rotation.shape[:-2]
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=rotation.dtype), (*batch, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


@jax.default_matmul_precision("highest")
def relative_pose(sensor_pose: jnp.ndarray, target_pose: jnp.ndarray) -> jnp.ndarray:
    """Target pose expressed in the sensor frame.

    Reference: pointcloud/PointCloudSet.py:503-507 — ``tanker_in_sensor_frame``
    = [Rs.T @ Rt | Rs.T @ (pt - ps); 0 0 0 1] built from two 4x4 world poses.
    """
    rs = sensor_pose[..., :3, :3]
    rt = target_pose[..., :3, :3]
    ps = sensor_pose[..., :3, 3]
    pt = target_pose[..., :3, 3]
    so3 = jnp.swapaxes(rs, -1, -2) @ rt
    t = jnp.einsum("...ji,...j->...i", rs, pt - ps)
    return se3_compose(so3, t)


# jit-compiled conveniences for host-side callers (GUI/toolkit paths).
get_dcm_jit = jax.jit(get_dcm)
solve_kabsch_jit = jax.jit(solve_kabsch)

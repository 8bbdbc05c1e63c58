"""On-device data augmentation.

Parity target: the jitter applied inside the reference's tf.data parse
function (``pointcloud/PointCloudSet.py:336-337``): per-point gaussian noise
scaled per-axis by ``jitter_stdev_m``. Here it runs inside the jitted train
step, so augmentation fuses into the same XLA program as the model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def jitter(
    points: jnp.ndarray,
    key: jax.Array,
    stdev_m: tuple[float, float, float] | jnp.ndarray,
) -> jnp.ndarray:
    """Add per-axis gaussian jitter to point clouds of shape (..., n, 3)."""
    stdev = jnp.asarray(stdev_m, dtype=points.dtype)
    noise = jax.random.normal(key, points.shape, dtype=points.dtype)
    return points + noise * stdev


def random_so3_rotation(key: jax.Array, batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Uniform random rotations (for augmentation experiments beyond the
    reference's jitter-only pipeline). Uses the QR-of-gaussian construction."""
    normals = jax.random.normal(key, (*batch_shape, 3, 3), dtype=dtype)
    q, r = jnp.linalg.qr(normals)
    # Fix signs so the distribution is Haar-uniform and det=+1.
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = jnp.linalg.det(q)
    q = q.at[..., :, 0].multiply(jnp.sign(det)[..., None])
    return q

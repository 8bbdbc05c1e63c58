"""Unit-sphere point-cloud normalization.

Functional parity with the reference's ``PointCloudNormalization`` layer
(``pointnet/PointNet.py:681-712``): center on the centroid, scale by the max
point distance with a 1e-7 floor. Implemented as a free function so XLA can
fuse it straight into the PointNet forward program (it is pure elementwise +
two reductions — no weights).
"""

from __future__ import annotations

import jax.numpy as jnp

from pointcloudprocessing_tpu.core.constants import NORMALIZATION_EPSILON


def normalize_unit_sphere(points: jnp.ndarray):
    """Normalize point clouds to the unit sphere.

    Args:
      points: (..., n, 3) point clouds.

    Returns:
      (normalized, (centroid, scale)) where centroid is (..., 1, 3) and scale
      is (..., 1, 1) — same contract as the reference layer's call
      (PointNet.py:691-706).
    """
    centroid = jnp.mean(points, axis=-2, keepdims=True)
    centered = points - centroid
    dist = jnp.sqrt(jnp.sum(jnp.square(centered), axis=-1))
    max_dist = jnp.max(dist, axis=-1, keepdims=True)[..., None]
    scale = jnp.maximum(max_dist, NORMALIZATION_EPSILON)
    return centered / scale, (centroid, scale)

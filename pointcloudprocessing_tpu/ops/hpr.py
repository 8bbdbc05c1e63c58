"""Hidden-point removal (visibility from a viewpoint).

Replaces open3d's ``hidden_point_removal`` used by the reference's mesh
sampler (examples/MeshSampler.py:300) — Katz, Tal & Basri 2007: spherical
inversion of the cloud about the camera, then the points whose inversions lie
on the convex hull are the visible ones.

The spherical flip is vectorized jnp (device-friendly); the convex hull is a
data-dependent host step (scipy.spatial.ConvexHull — the same Qhull open3d
wraps), which is fine on the offline synthesis path where the reference uses
it. ``radius`` is the absolute inversion-sphere radius (open3d semantics);
the default is 100x the max camera distance — large enough to see the whole
surface, small enough that clearly-occluded back faces don't leak into the
hull (very large radii flatten the inversion and admit back-face points).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def spherical_flip(points: jnp.ndarray, camera: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Invert points about a sphere of ``radius`` centered on the camera."""
    rel = points - camera
    norm = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    norm = jnp.maximum(norm, 1e-12)
    return rel + 2.0 * (radius - norm) * rel / norm


def hidden_point_removal(
    points: np.ndarray, camera: np.ndarray, radius: float | None = None
) -> np.ndarray:
    """Indices of points visible from ``camera``.

    Args:
      points: (n, 3) host array.
      camera: (3,) camera position.
      radius: inversion sphere radius; None -> 100 * max distance from the
        camera (larger radii leak occluded back-face points into the hull).

    Returns sorted int indices of visible points.
    """
    from scipy.spatial import ConvexHull

    points = np.asarray(points, dtype=np.float64)
    camera = np.asarray(camera, dtype=np.float64)
    rel = points - camera
    dists = np.linalg.norm(rel, axis=-1)
    if radius is None:
        radius = float(dists.max()) * 100.0

    flipped = np.asarray(spherical_flip(points, camera, radius))
    # include the camera origin so the hull encloses the viewpoint
    cloud = np.concatenate([flipped, np.zeros((1, 3))], axis=0)
    hull = ConvexHull(cloud)
    visible = np.unique(hull.vertices)
    return np.sort(visible[visible < len(points)])

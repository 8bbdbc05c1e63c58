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
import jax
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

    # host-side f64 flip: routing through jnp would silently truncate to
    # f32 (x64 disabled), and the ~radius-magnitude flipped coordinates
    # carry depth differences compressed by ~1/200 — Qhull needs the
    # double precision the casts above establish
    norm = np.maximum(dists[:, None], 1e-12)
    flipped = rel + 2.0 * (radius - norm) * rel / norm
    # include the camera origin so the hull encloses the viewpoint
    cloud = np.concatenate([flipped, np.zeros((1, 3))], axis=0)
    hull = ConvexHull(cloud)
    visible = np.unique(hull.vertices)
    return np.sort(visible[visible < len(points)])


def _octahedral_bins(direction: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Map unit directions (..., 3) to integer cells of an octahedral grid.

    The octahedron unfolds the full sphere onto [0, 1]^2 with approximately
    uniform solid angle per cell — the standard seamless direction
    parameterization (no pole singularities, unlike lat/long)."""
    ax = jnp.sum(jnp.abs(direction), axis=-1, keepdims=True)
    p = direction[..., :2] / jnp.maximum(ax, 1e-12)
    # fold the lower hemisphere outward
    lower = direction[..., 2:3] < 0.0
    folded = (1.0 - jnp.abs(p[..., ::-1])) * jnp.where(p >= 0.0, 1.0, -1.0)
    p = jnp.where(lower, folded, p)
    cell = jnp.clip(((p * 0.5 + 0.5) * grid).astype(jnp.int32), 0, grid - 1)
    return cell[..., 0] * grid + cell[..., 1]


def hidden_point_removal_mask(
    points: jnp.ndarray,
    camera: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
    grid: int = 64,
    tol: float = 0.05,
) -> jnp.ndarray:
    """Fixed-shape on-device visibility: (b, n) bool mask, jit-safe.

    Device-friendly alternative to :func:`hidden_point_removal` (whose
    convex hull is a data-dependent host step): a z-buffer over octahedral
    direction bins. A point is visible when its camera distance is within
    ``(1 + tol)`` of the nearest point sharing its direction bin — the
    classic depth-buffer visibility test, O(n log n) as one two-key sort
    with no hull. Compared to the Katz spherical-flip hull it is slightly
    stricter at silhouette edges (a hull admits extreme-direction points a
    nearer bin-mate would occlude here) and its angular resolution is the
    bin size: ``grid`` trades edge recall against see-through leakage.

    Args:
      points: (b, n, 3) (or (n, 3), auto-promoted).
      camera: (b, 3) / (3,) viewpoint(s).
      valid_mask: optional (b, n) bool.
      grid: octahedral cells per axis (grid^2 bins over the sphere).
      tol: relative depth window counted as the front surface.
    """
    single = points.ndim == 2
    camera = jnp.asarray(camera)
    if single:
        points = points[None]
        camera = camera[None]
        valid_mask = None if valid_mask is None else valid_mask[None]
    if camera.ndim == 1:
        # one viewpoint for a whole batch — the docstring's (3,) case
        camera = jnp.broadcast_to(camera, (points.shape[0], 3))
    b, n = points.shape[:2]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), bool)

    rel = points - camera[:, None, :]
    r = jnp.linalg.norm(rel, axis=-1)
    direction = rel / jnp.maximum(r, 1e-12)[..., None]
    bins = _octahedral_bins(direction, grid)
    big = jnp.iinfo(jnp.int32).max
    bins = jnp.where(valid_mask, bins, big)

    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    sbin, sr, sidx = jax.lax.sort((bins, r, idx), dimension=-1, num_keys=2)

    # per-bin nearest distance, broadcast forward over each segment: rows are
    # ascending-r within a bin, so the segment's first r is its minimum
    is_new = jnp.concatenate(
        [jnp.ones((b, 1), bool), sbin[:, 1:] != sbin[:, :-1]], axis=1
    )
    seg_min, _ = jax.lax.associative_scan(
        # segmented copy-forward: (value at the last segment start, seen-start)
        lambda a, c: (jnp.where(c[1], c[0], a[0]), a[1] | c[1]),
        (jnp.where(is_new, sr, 0.0), is_new),
        axis=1,
    )
    svis = sr <= seg_min * (1.0 + tol)

    # return to input order: one more sort on the original index
    _, vis = jax.lax.sort(
        (sidx, svis.astype(jnp.int32)), dimension=-1, num_keys=1
    )
    out = vis.astype(bool) & valid_mask
    return out[0] if single else out

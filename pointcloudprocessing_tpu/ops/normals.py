"""PCA normal estimation over kNN neighborhoods.

North-star preprocessing op (BASELINE.json: "PCA normal estimation"). For
each point: take its k nearest neighbors, form the 3x3 neighborhood
covariance, and take the eigenvector of the smallest eigenvalue. The
eigenvector is computed with a closed-form symmetric 3x3 eigen-solver
(trigonometric method) instead of ``jnp.linalg.eigh`` — branch-free, purely
elementwise, and orders of magnitude faster than a batched QR iteration on
TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudprocessing_tpu.ops.knn import knn


def smallest_eigenvector_sym3x3(a: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., 3, 3).

    Eigenvalues via the trigonometric closed form (Smith's method); the
    eigenvector via the null space of (A - lambda I) using the two largest
    cross products of its rows (numerically robust pick).
    """
    a = a.astype(jnp.float32)
    eps = 1e-12

    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=a.dtype)
    b = a - q[..., None, None] * eye
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, eps))
    detb = jnp.linalg.det(b)
    r = detb / (2.0 * p**3 + eps)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: q + 2p cos(phi + 2k pi/3); smallest at k=1 shift
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    m = a - lam_min[..., None, None] * eye
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)

    best = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    pick = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(best, pick[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    # degenerate (isotropic) neighborhoods: fall back to +z
    good = jnp.max(norms, axis=-1) > eps
    v = jnp.where(good[..., None], v, jnp.array([0.0, 0.0, 1.0], a.dtype))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def estimate_normals(
    points: jnp.ndarray,
    k: int = 16,
    valid_mask: jnp.ndarray | None = None,
    viewpoint: jnp.ndarray | None = None,
    exact: bool = False,
) -> jnp.ndarray:
    """Per-point unit normals from PCA over k neighborhoods.

    Args:
      points: (n, 3).
      k: neighborhood size (includes the point itself).
      valid_mask: optional (n,) bool.
      viewpoint: optional (3,) — orient normals toward this point.
      exact: False (default) uses approx_min_k neighbors — ~10x faster on
        TPU with negligible effect on the PCA plane fit.

    Returns (n, 3) unit normals.
    """
    idx, d2 = knn(points, points, k, valid_mask, exact)
    # neighborhoods smaller than k (few valid points): top-k pads with
    # masked +inf entries whose indices are garbage — substitute the query
    # point itself (zero contribution after centering)
    own = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    idx = jnp.where(jnp.isfinite(d2), idx, own)
    neighbors = points[idx]  # (n, k, 3)
    mean = jnp.mean(neighbors, axis=-2, keepdims=True)
    centered = neighbors - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    normals = smallest_eigenvector_sym3x3(cov)

    if viewpoint is not None:
        to_view = viewpoint[None, :] - points
        sign = jnp.sign(jnp.sum(normals * to_view, axis=-1, keepdims=True))
        normals = normals * jnp.where(sign == 0, 1.0, sign)
    return normals


def estimate_normals_batch(
    points: jnp.ndarray,
    k: int = 16,
    valid_mask: jnp.ndarray | None = None,
    viewpoint: jnp.ndarray | None = None,
    exact: bool = False,
):
    if valid_mask is None:
        valid_mask = jnp.ones(points.shape[:2], bool)
    if viewpoint is None:
        return jax.vmap(lambda p, m: estimate_normals(p, k, m, None, exact))(points, valid_mask)
    return jax.vmap(lambda p, m, v: estimate_normals(p, k, m, v, exact))(
        points, valid_mask, viewpoint
    )

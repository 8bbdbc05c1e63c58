"""k-nearest-neighbor search via MXU distance matmuls.

North-star preprocessing op (BASELINE.json: "kNN grouping"). Brute-force
pairwise distances computed as ``|a|^2 + |b|^2 - 2 a.b^T`` — the cross term
is a (n, 3) x (3, m) matmul that XLA tiles onto the MXU — followed by
``lax.top_k``. Exact (no approximation), fixed shapes, fully fusable into a
larger preprocessing program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dists(queries: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """(nq, 3), (np, 3) -> (nq, np) squared euclidean distances.

    The cross term MUST run at HIGHEST matmul precision: TPU's default
    single-bf16-pass matmul carries ~4e-3 relative error, and the expansion
    subtracts ~|p|^2-magnitude terms to recover neighbor distances that can
    be 4+ orders smaller — at 25 m scene offsets the default precision
    corrupts every neighborhood (measured 7.6 deg median normal error vs
    f32). The matmul is (n, 3) x (3, m) — contraction depth 3 — so the
    6-pass cost is negligible against the (n, m) output traffic.
    """
    q2 = jnp.sum(jnp.square(queries), axis=-1, keepdims=True)
    p2 = jnp.sum(jnp.square(points), axis=-1)
    cross = jnp.matmul(queries, points.T, precision=jax.lax.Precision.HIGHEST)
    d = q2 + p2[None, :] - 2.0 * cross
    return jnp.maximum(d, 0.0)  # clamp negative rounding residue


def knn(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    valid_mask: jnp.ndarray | None = None,
    exact: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query among points.

    Args:
      queries: (nq, 3); points: (np, 3).
      valid_mask: optional (np,) bool; invalid points are pushed to +inf.
      exact: True -> lax.top_k (exact, slower); False -> lax.approx_min_k
        (TPU-optimized partial reduction, ~10x faster at n=8192, recall
        ~0.95+ — the right default for normal estimation / grouping).

    Returns (indices (nq, k) int32, sq_dists (nq, k)) sorted ascending.
    """
    d = pairwise_sq_dists(queries, points)
    if valid_mask is not None:
        d = jnp.where(valid_mask[None, :], d, jnp.inf)
    if exact:
        neg_d, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), -neg_d
    vals, idx = jax.lax.approx_min_k(d, k)
    return idx.astype(jnp.int32), vals


def knn_batch(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    valid_mask: jnp.ndarray | None = None,
    exact: bool = True,
):
    """(b, nq, 3), (b, np, 3) -> ((b, nq, k), (b, nq, k))."""
    if valid_mask is None:
        valid_mask = jnp.ones(points.shape[:2], bool)
    return jax.vmap(lambda q, p, m: knn(q, p, k, m, exact))(queries, points, valid_mask)


def group_points(points: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor groups: points (n, c), indices (nq, k) -> (nq, k, c)."""
    return points[indices]

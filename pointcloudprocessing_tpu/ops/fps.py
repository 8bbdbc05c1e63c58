"""Farthest-point sampling (FPS) as a fixed-shape XLA loop.

North-star preprocessing op (BASELINE.json). Standard O(k*n) iteration: keep
a running min-distance-to-selected-set per point; each step picks the argmax.
The inner update is pure VPU elementwise work over a static (n,) buffer and
the loop is a ``lax.fori_loop`` with static trip count — compiles to one
tight XLA while-loop on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    start_index: int = 0,
) -> jnp.ndarray:
    """Select ``num_samples`` indices by farthest-point sampling.

    Args:
      points: (n, 3).
      valid_mask: optional (n,) bool — invalid points are never selected.
      start_index: index of the seed point.

    Returns (num_samples,) int32 indices. If fewer valid points than
    num_samples exist, selections repeat the farthest remaining valid points.
    """
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)

    # never seed from an invalid (padding) row: fall back to the first valid
    # point (all-invalid clouds degenerate to index 0)
    start = jnp.where(
        valid_mask[start_index],
        jnp.asarray(start_index, jnp.int32),
        jnp.argmax(valid_mask).astype(jnp.int32),
    )

    inf = jnp.asarray(jnp.inf, points.dtype)
    neg = -inf

    def body(i, carry):
        min_dist, selected = carry
        last = selected[i - 1]
        d = jnp.sum(jnp.square(points - points[last]), axis=-1)
        min_dist = jnp.minimum(min_dist, d)
        scored = jnp.where(valid_mask, min_dist, neg)
        nxt = jnp.argmax(scored).astype(jnp.int32)
        return min_dist, selected.at[i].set(nxt)

    selected0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(start)
    min_dist0 = jnp.full((n,), inf)
    _, selected = jax.lax.fori_loop(1, num_samples, body, (min_dist0, selected0))
    return selected


def farthest_point_sample_batch(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(b, n, 3) -> (b, num_samples) indices."""
    if valid_mask is None:
        valid_mask = jnp.ones(points.shape[:2], bool)
    return jax.vmap(lambda p, m: farthest_point_sample(p, num_samples, m))(
        points, valid_mask
    )

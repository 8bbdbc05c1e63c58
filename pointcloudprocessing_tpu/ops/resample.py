"""Fixed-width resampling of ragged point clouds.

The network consumes fixed-shape (n, 3) tensors. Frames arrive with variable
point counts; oversized frames are truncated to the first ``width`` points and
undersized frames are padded with a uniform random repeat-sample of existing
points, keeping per-point labels aligned with their points.

Functional parity: ``PointCloudSet._adjust_to_input_width``
(``pointcloud/PointCloudSet.py:443-470``) — including its quirk of drawing
repeat indices with ``np.random.uniform(0, n)`` (so index n is reachable only
with probability 0; truncation toward zero biases identically).

Two implementations:
- ``adjust_to_input_width_np``: host-side numpy, used on the ingest path.
- ``adjust_to_input_width``: jnp, fixed-shape + mask formulation so batched
  resampling can run on device inside a jit program.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def adjust_to_input_width_np(
    observations: np.ndarray,
    part_labels: np.ndarray,
    width: int,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side resample of one frame to ``width`` points.

    Args:
      observations: (n, 3) float array.
      part_labels: (n,) int array aligned with observations.
      width: target point count.
      rng: numpy Generator for the repeat-sample draw (None -> fresh default).

    Returns (observations (width, 3), part_labels (width,)).
    """
    n = observations.shape[0]
    if n > width:
        return observations[:width], part_labels[:width]
    if n == width:
        return observations, part_labels

    gen = rng if rng is not None else np.random.default_rng()
    repeated = gen.uniform(0, n, width - n).astype(np.int_)
    observations = np.concatenate([observations, observations[repeated]], axis=0)
    part_labels = np.concatenate([part_labels, part_labels[repeated]], axis=0)
    return observations, part_labels


def adjust_to_input_width(
    points: jnp.ndarray,
    labels: jnp.ndarray,
    valid_count: jnp.ndarray,
    width: int,
    key: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side fixed-shape resample.

    Args:
      points: (max_n, 3) buffer with ``valid_count`` valid rows at the front.
      labels: (max_n,) aligned labels.
      valid_count: scalar int — number of valid points.
      width: static output width.
      key: PRNG key for repeat-sample indices.

    Returns (points (width, 3), labels (width,)). Rows beyond ``valid_count``
    in the input buffer are never selected. When ``valid_count >= width`` the
    result is the first ``width`` valid rows (same truncation rule as the
    reference); otherwise rows [valid_count, width) are uniform repeats of the
    valid prefix.
    """
    max_n = points.shape[0]

    idx = jnp.arange(width)
    # Uniform repeat indices into the valid prefix.
    rand = jax.random.uniform(key, (width,)) * valid_count
    repeat_idx = rand.astype(jnp.int32)
    # Positions < valid_count keep their own point; the pad tail repeats.
    gather = jnp.where(idx < valid_count, idx, repeat_idx)
    gather = jnp.clip(gather, 0, max_n - 1)
    return points[gather], labels[gather]


def adjust_batch_to_input_width(
    points: jnp.ndarray,
    labels: jnp.ndarray,
    valid_counts: jnp.ndarray,
    width: int,
    key: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """vmap of :func:`adjust_to_input_width` over a batch of padded frames."""
    keys = jax.random.split(key, points.shape[0])
    return jax.vmap(
        lambda p, l, c, k: adjust_to_input_width(p, l, c, width, k)
    )(points, labels, valid_counts, keys)

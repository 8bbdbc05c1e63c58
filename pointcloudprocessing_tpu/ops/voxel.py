"""Voxel-grid downsampling as a fixed-shape XLA program.

North-star generalization of the reference's resampling ops (BASELINE.json:
"voxel downsampling ... becomes fused Pallas kernels over padded fixed-shape
point tensors"); the reference itself only truncates/repeat-samples
(PointCloudSet.py:443-470).

Fixed-shape formulation: output has the same max length as the input plus a
validity mask — data-dependent unique-voxel counts never leave the device.
Pipeline: quantize -> lexicographic voxel key -> sort -> segment boundaries
-> dense ranks -> segment mean (centroid mode) or first-point gather.
Everything is sorts/scans/segment-sums, which XLA lowers well on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_downsample(
    points: jnp.ndarray,
    voxel_size: float,
    valid_mask: jnp.ndarray | None = None,
    reduction: str = "centroid",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Downsample one cloud by voxel grid.

    Args:
      points: (n, 3).
      voxel_size: edge length of the cubic voxel.
      valid_mask: optional (n,) bool; invalid rows are ignored.
      reduction: 'centroid' (mean of voxel members) or 'first' (lowest input
        index in the voxel — deterministic representative).

    Returns:
      (out_points (n, 3), out_mask (n,)) — out_mask[i] True for the first
      k rows, where k = number of occupied voxels; those rows hold the voxel
      representatives (ordered by voxel key). Invalid tail rows are zeros.
    """
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)

    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    # Two-key lexicographic sort (each jnp sort pass is the dominant cost):
    # keys are built from per-cloud-min-offset coords so they are
    # non-negative. Minor key packs (y, z) into one int32 (15 bits each —
    # exact for grid extents < 32768 voxels per axis, i.e. any real scan);
    # major key is x with invalid rows pushed to +inf so valid points sort
    # first, grouped by voxel.
    rel = coords - jnp.min(
        jnp.where(valid_mask[:, None], coords, jnp.iinfo(jnp.int32).max),
        axis=0,
    )
    yz = jnp.clip(rel[:, 1], 0, 32767) * 32768 + jnp.clip(rel[:, 2], 0, 32767)
    major = jnp.where(valid_mask, rel[:, 0], jnp.iinfo(jnp.int32).max)
    order = jnp.lexsort((yz, major))
    sorted_coords = coords[order]
    sorted_points = points[order]
    sorted_valid = valid_mask[order]

    # valid rows sort first, so segment opens are simply coordinate changes
    # among valid rows (plus row 0)
    differs = jnp.any(sorted_coords[1:] != sorted_coords[:-1], axis=-1)
    is_new = jnp.concatenate([jnp.ones((1,), bool), differs]) & sorted_valid
    rank = jnp.cumsum(is_new) - 1  # dense segment id per sorted row
    rank = jnp.where(sorted_valid, rank, n - 1)  # dump invalids in last bucket

    num_voxels = jnp.sum(is_new)

    if reduction == "centroid":
        sums = jax.ops.segment_sum(
            jnp.where(sorted_valid[:, None], sorted_points, 0.0), rank, num_segments=n
        )
        counts = jax.ops.segment_sum(
            sorted_valid.astype(points.dtype), rank, num_segments=n
        )
        out = sums / jnp.maximum(counts, 1.0)[:, None]
    elif reduction == "first":
        # lowest original index within each voxel
        orig_idx = order
        INF = jnp.int32(n)
        min_idx = jax.ops.segment_min(
            jnp.where(sorted_valid, orig_idx, INF).astype(jnp.int32),
            rank,
            num_segments=n,
        )
        min_idx = jnp.clip(min_idx, 0, n - 1)
        out = points[min_idx]
    else:
        raise ValueError(f"Unknown reduction {reduction!r}")

    out_mask = jnp.arange(n) < num_voxels
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask


def voxel_downsample_batch(
    points: jnp.ndarray,
    voxel_size: float,
    valid_mask: jnp.ndarray | None = None,
    reduction: str = "centroid",
):
    """vmap over a batch of padded clouds: (b, n, 3) -> ((b, n, 3), (b, n))."""
    if valid_mask is None:
        valid_mask = jnp.ones(points.shape[:2], bool)
    return jax.vmap(lambda p, m: voxel_downsample(p, voxel_size, m, reduction))(
        points, valid_mask
    )

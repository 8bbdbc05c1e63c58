"""Voxel-grid downsampling as a fixed-shape XLA program.

North-star generalization of the reference's resampling ops (BASELINE.json:
"voxel downsampling ... becomes fused Pallas kernels over padded fixed-shape
point tensors"); the reference itself only truncates/repeat-samples
(PointCloudSet.py:443-470).

Fixed-shape formulation: output has the same max length as the input plus a
validity mask — data-dependent unique-voxel counts never leave the device.
Pipeline: quantize -> two-key Morton voxel code -> sort -> segment
boundaries -> dense ranks -> segment reduce. The Morton order makes the
output spatially local in index order, which the windowed normals kernel
consumes directly (ops/pallas/window_normals.py).

TPU-shaped implementation notes (measured on v5e, 256 x 2048 pts):

- The segment reduce is a **one-hot MXU contraction** over the dense ranks,
  not a ``segment_sum``: XLA lowers scatter on TPU to a serialized loop that
  costs ~25 ms/batch, while the equivalent ``einsum('bnk,bnd->bkd')`` runs in
  a few ms. Counts ride along as a fused ones-column (d = xyz + 1), so sums
  and counts cost one matmul.
- The reduce contraction runs as TWO bf16 passes with a pre-split data
  operand (ops/pallas/voxel_reduce.py): a single default-precision pass
  truncates coordinates to bf16 — measured 6 cm centroid error at 30 m
  scenes — while hi+lo recovers ~2^-16 relative (~0.01 mm).
- 'first' mode exploits sort stability: the first sorted row of each segment
  has the lowest original index, so the same contraction with the segment-
  open mask extracts the representative point with no ``segment_min``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_downsample_batch(
    points: jnp.ndarray,
    voxel_size: float,
    valid_mask: jnp.ndarray | None = None,
    reduction: str = "centroid",
    layout: str = "bnc",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Downsample a batch of padded clouds by voxel grid.

    Args:
      points: (b, n, 3).
      voxel_size: edge length of the cubic voxel.
      valid_mask: optional (b, n) bool; invalid rows are ignored.
      reduction: 'centroid' (mean of voxel members) or 'first' (lowest input
        index in the voxel — deterministic representative).
      layout: 'bnc' returns out_points (b, n, 3); 'bcn' returns the
        plane-major (b, 3, n) — the natural SoA layout of this pipeline
        (the sort already yields coordinate planes) and what the Pallas
        normals/FPS kernels consume. On TPU 'bcn' skips ~100 us of
        (b, n, 3) relayout copies per 8x8192 batch (docs/PERF.md).

    Returns:
      (out_points, out_mask (b, n)) — out_mask[i] True for the
      first k rows, where k = number of occupied voxels; those rows hold the
      voxel representatives in Morton (Z-curve) order — spatially local in
      index order. Invalid tail rows are 0.
    """
    if reduction not in ("centroid", "first"):
        raise ValueError(f"Unknown reduction {reduction!r}")
    if layout not in ("bnc", "bcn"):
        raise ValueError(f"Unknown layout {layout!r}")
    b, n = points.shape[:2]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), bool)

    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    big = jnp.iinfo(jnp.int32).max
    # Two-key MORTON sort on per-cloud-min-offset coords (non-negative
    # keys, 15 bits per axis — exact for grid extents < 32768 voxels per
    # axis, i.e. any real scan). Equal coords still map to equal keys (the
    # voxel-grouping requirement), and the Z-curve order additionally gives
    # the output SPATIAL LOCALITY in index order, which the windowed
    # normals kernel (ops/pallas/window_normals.py) exploits downstream.
    # Invalid rows get hi = +inf so valid points sort first; the sort is
    # stable, so ties keep ascending original index.
    from pointcloudprocessing_tpu.ops.morton import morton_keys_3d

    rel = coords - jnp.min(
        jnp.where(valid_mask[..., None], coords, big), axis=1, keepdims=True
    )
    hi, lo = morton_keys_3d(rel[..., 0], rel[..., 1], rel[..., 2])
    hi = jnp.where(valid_mask, hi, big)
    # ONE variadic sort carries every payload through the sorting network —
    # a separate argsort + take_along_axis permutation costs ~4 ms per gather
    # on TPU (row gathers serialize), ~3x the sort itself. Validity does NOT
    # ride as a payload: valid rows carry hi <= 2^15-1 < big, so after the
    # stable sort exactly the first num_valid rows are valid.
    (_, _, sx, sy, sz) = jax.lax.sort(
        (hi, lo, points[..., 0], points[..., 1], points[..., 2]),
        dimension=-1,
        is_stable=True,
        num_keys=2,
    )
    sorted_points = jnp.stack([sx, sy, sz], axis=-1)
    num_valid = jnp.sum(valid_mask, axis=1)
    sorted_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) < num_valid[:, None]
    )
    # recomputing the quantization on sorted rows is exact (same floor on
    # the same float values), so no coordinate payloads are needed
    sorted_coords = jnp.floor(sorted_points / voxel_size).astype(jnp.int32)

    # valid rows sort first, so segment opens are simply coordinate changes
    # among valid rows (plus row 0)
    differs = jnp.any(sorted_coords[:, 1:] != sorted_coords[:, :-1], axis=-1)
    is_new = (
        jnp.concatenate([jnp.ones((b, 1), bool), differs], axis=1) & sorted_valid
    )
    rank = jnp.cumsum(is_new, axis=1) - 1  # dense segment id per sorted row
    rank = jnp.where(sorted_valid, rank, n - 1)  # dump invalids in last bucket
    num_voxels = jnp.sum(is_new, axis=1)

    weights = (sorted_valid if reduction == "centroid" else is_new).astype(
        points.dtype
    )
    out_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) < num_voxels[:, None]
    )
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if layout == "bcn" and on_tpu:
        # plane-major output: run the AoS banded kernel, then ONE XLA
        # transpose of its (b, n, 4) result (~24 us at 8x8192) and do all
        # post-processing on plane rows, so the mask/centroid fusions and
        # the downstream normals/FPS kernels see (b, c, n) natively. (A
        # plane-major twin of the reduce kernel measured 306 vs 187 us —
        # the in-kernel rank-vector transposes per chunk cost more than
        # XLA's single bulk transpose; docs/PERF.md.)
        from pointcloudprocessing_tpu.ops.pallas.voxel_reduce import (
            sorted_segment_reduce_pallas,
        )

        data = jnp.concatenate(
            [sorted_points * weights[..., None], weights[..., None]], axis=-1
        )
        reduced = jnp.swapaxes(
            sorted_segment_reduce_pallas(data, rank), 1, 2
        )  # (b, 4, n)
        sums, counts = reduced[:, :3], reduced[:, 3]
        if reduction == "centroid":
            out = sums / jnp.maximum(counts, 1.0)[:, None, :]
        else:
            out = sums
        return jnp.where(out_mask[:, None, :], out, 0.0), out_mask

    # segment reduce as one MXU contraction: data carries a ones column so
    # counts come out of the same matmul
    data = jnp.concatenate(
        [sorted_points * weights[..., None], weights[..., None]], axis=-1
    )
    if on_tpu:
        # Pallas kernel: the one-hot slab is generated in VMEM instead of
        # materializing (b, n, n) in HBM (~9x over the einsum, which in turn
        # beats TPU's serialized scatter lowering by ~9x). rank is monotone
        # by construction (cumsum over sort order), so the BANDED variant
        # applies: each output tile contracts only its own row band.
        from pointcloudprocessing_tpu.ops.pallas.voxel_reduce import (
            sorted_segment_reduce_pallas,
        )

        reduced = sorted_segment_reduce_pallas(data, rank)
    else:
        # CPU/GPU: scatter-based segment_sum is linear in memory and lowers
        # fine off-TPU (a dense one-hot would be O(b*n^2))
        reduced = jax.vmap(
            lambda d, r: jax.ops.segment_sum(d, r, num_segments=n)
        )(data, rank)
    sums, counts = reduced[..., :3], reduced[..., 3]
    if reduction == "centroid":
        out = sums / jnp.maximum(counts, 1.0)[..., None]
    else:
        out = sums  # exactly one weighted row per segment

    out = jnp.where(out_mask[..., None], out, 0.0)
    if layout == "bcn":  # CPU/GPU fallback: transpose at the end
        out = jnp.swapaxes(out, 1, 2)
    return out, out_mask


def voxel_downsample(
    points: jnp.ndarray,
    voxel_size: float,
    valid_mask: jnp.ndarray | None = None,
    reduction: str = "centroid",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-cloud voxel downsample: (n, 3) -> ((n, 3), (n,))."""
    mask = None if valid_mask is None else valid_mask[None]
    out, out_mask = voxel_downsample_batch(points[None], voxel_size, mask, reduction)
    return out[0], out_mask[0]

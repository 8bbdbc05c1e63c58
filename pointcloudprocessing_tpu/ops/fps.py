"""Farthest-point sampling (FPS) as a fixed-shape XLA program.

North-star preprocessing op (BASELINE.json). Standard O(k*n) iteration: keep
a running min-distance-to-selected-set per point; each step picks the argmax.

TPU-shaped implementation notes (measured on v5e, batch 256 x 2048 pts -> 1024):

- The selection loop runs at **batch level** (one ``lax.fori_loop`` whose
  body updates all clouds at once). A per-cloud ``fori_loop`` under ``vmap``
  lowers to per-iteration batched gathers/scatters that cost ~15x more
  (375 ms vs 25 ms per batch).
- ``method='distmat'`` precomputes the full pairwise squared-distance matrix
  with one MXU matmul and turns the loop body into a row gather + min +
  argmax (20 ms vs 25 ms for the streaming form). Memory is B*N^2 floats, so
  ``method='auto'`` falls back to the streaming form for large inputs.
- The streaming form extracts the last selected point with a one-hot
  contraction (fusable VPU work) rather than a batched dynamic gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEFAULT_DISTMAT_BYTES = 2 * 1024**3


def _pallas_block_ok(b: int, n: int, num_samples: int) -> bool:
    from pointcloudprocessing_tpu.ops.pallas.fps import _cloud_block

    try:
        _cloud_block(b, n, num_samples)
        return True
    except ValueError:
        return False


def _seed_indices(valid_mask: jnp.ndarray, start_index: int) -> jnp.ndarray:
    """Per-cloud seed: ``start_index`` if valid, else first valid point."""
    b = valid_mask.shape[0]
    start = jnp.full((b,), start_index, jnp.int32)
    fallback = jnp.argmax(valid_mask, axis=1).astype(jnp.int32)
    return jnp.where(valid_mask[:, start_index], start, fallback)


def farthest_point_sample_batch(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    start_index: int = 0,
    method: str = "auto",
    max_distmat_bytes: int = _DEFAULT_DISTMAT_BYTES,
) -> jnp.ndarray:
    """FPS over a batch of padded clouds: (b, n, 3) -> (b, num_samples).

    Args:
      points: (b, n, 3).
      valid_mask: optional (b, n) bool — invalid points are never selected.
      start_index: seed index (falls back to the first valid point per cloud
        when the seed row is invalid).
      method: 'distmat' (precomputed pairwise matrix, fastest when it fits),
        'stream' (O(n) memory), or 'auto'.
      max_distmat_bytes: 'auto' picks 'distmat' while b*n*n*4 stays under
        this budget.

    If fewer valid points than num_samples exist, selections repeat the
    farthest remaining valid points.
    """
    b, n = points.shape[:2]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), bool)
    if method == "auto":
        # on TPU the VMEM-resident Pallas kernel wins (~3x over distmat) as
        # long as a valid cloud block exists (full batch in VMEM or a
        # 128-multiple slice of it — Mosaic lane-blocking rule)
        if (
            jax.default_backend() in ("tpu", "axon")
            and n <= 16384
            and _pallas_block_ok(b, n, num_samples)
        ):
            method = "pallas"
        else:
            method = "distmat" if b * n * n * 4 <= max_distmat_bytes else "stream"

    start = _seed_indices(valid_mask, start_index)
    if method == "pallas":
        from pointcloudprocessing_tpu.ops.pallas.fps import fps_pallas

        return fps_pallas(points, num_samples, valid_mask, start)
    neg = jnp.asarray(-jnp.inf, points.dtype)
    min_dist0 = jnp.full((b, n), jnp.inf, points.dtype)

    if method == "distmat":
        sq = jnp.sum(points * points, axis=-1)
        # HIGHEST: the |p|^2 expansion cancels catastrophically under TPU's
        # default single-bf16-pass matmul (see ops/knn.pairwise_sq_dists)
        gram = jnp.einsum(
            "bnd,bmd->bnm", points, points,
            precision=jax.lax.Precision.HIGHEST,
        )
        dist = sq[:, :, None] + sq[:, None, :] - 2.0 * gram

        def step(min_dist, last):
            row = jnp.take_along_axis(
                dist, last[:, None, None].astype(jnp.int32), axis=1
            )[:, 0, :]
            return jnp.minimum(min_dist, row)

    elif method == "stream":

        def step(min_dist, last):
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) == last[:, None]
            ).astype(points.dtype)
            last_pt = jnp.einsum("bn,bnd->bd", onehot, points)
            d = jnp.sum(jnp.square(points - last_pt[:, None, :]), axis=-1)
            return jnp.minimum(min_dist, d)

    else:
        raise ValueError(f"Unknown method {method!r}")

    def body(i, carry):
        min_dist, selected = carry
        min_dist = step(min_dist, selected[:, i - 1])
        nxt = jnp.argmax(jnp.where(valid_mask, min_dist, neg), axis=-1)
        return min_dist, selected.at[:, i].set(nxt.astype(jnp.int32))

    selected0 = jnp.zeros((b, num_samples), jnp.int32).at[:, 0].set(start)
    if num_samples == 1:
        return selected0
    _, selected = jax.lax.fori_loop(1, num_samples, body, (min_dist0, selected0))
    return selected


def farthest_point_sample_and_gather(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    start_index: int = 0,
    chains: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FPS returning (indices (b, k), sampled points (b, k, 3)).

    On TPU the Pallas kernel emits the selected coordinates directly (it
    extracts them every iteration anyway); a post-hoc ``take_along_axis``
    row gather costs ~10 ms/batch at 256x2048 — more than the sampling
    itself. Other backends fall back to indices + gather.

    ``chains > 1`` runs BLOCKED FPS: each cloud splits into ``chains``
    stride-striped subsets sampled independently and concurrently, cutting
    the serial selection loop (FPS's whole cost) by ``chains`` for the same
    total element work. On spatially ordered input (the Morton-ordered
    voxel output) each stride subset is a stratified sample of the cloud,
    so the union of per-subset FPS selections is nearly as well spread as
    exact FPS (covering-radius test in test_preprocess_ops.py). Exact FPS
    remains the default. Use only when every cloud has far more valid
    points than ``num_samples`` — a subset with no valid points would
    contribute padding rows.
    """
    b, n = points.shape[:2]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), bool)
    if chains > 1:
        return _blocked_fps_and_gather(points, num_samples, valid_mask, chains)
    if (
        jax.default_backend() in ("tpu", "axon")
        and n <= 16384
        and _pallas_block_ok(b, n, num_samples)
    ):
        from pointcloudprocessing_tpu.ops.pallas.fps import fps_pallas_with_points

        start = _seed_indices(valid_mask, start_index)
        return fps_pallas_with_points(points, num_samples, valid_mask, start)
    idx = farthest_point_sample_batch(points, num_samples, valid_mask, start_index)
    sampled = jnp.take_along_axis(points, idx[..., None], axis=1)
    return idx, sampled


def _blocked_fps_and_gather(
    points: jnp.ndarray, num_samples: int, valid_mask: jnp.ndarray, chains: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, n = points.shape[:2]
    if n % chains or num_samples % chains:
        raise ValueError(
            f"blocked FPS needs chains ({chains}) dividing both n ({n}) and "
            f"num_samples ({num_samples})"
        )
    m, k = n // chains, num_samples // chains
    # subset c owns original indices j with j % chains == c
    p_r = jnp.moveaxis(points.reshape(b, m, chains, 3), 2, 1).reshape(
        b * chains, m, 3
    )
    v_r = jnp.moveaxis(valid_mask.reshape(b, m, chains), 2, 1).reshape(
        b * chains, m
    )
    idx_r, sampled_r = farthest_point_sample_and_gather(p_r, k, v_r)
    chain_of = jnp.arange(b * chains, dtype=jnp.int32)[:, None] % chains
    idx = (idx_r * chains + chain_of).reshape(b, num_samples)
    sampled = sampled_r.reshape(b, num_samples, 3)
    return idx, sampled


def farthest_point_sample(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    start_index: int = 0,
    method: str = "auto",
) -> jnp.ndarray:
    """Single-cloud FPS: (n, 3) -> (num_samples,) int32 indices."""
    mask = None if valid_mask is None else valid_mask[None]
    return farthest_point_sample_batch(
        points[None], num_samples, mask, start_index, method
    )[0]

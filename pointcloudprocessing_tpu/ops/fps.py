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
    allow_pallas: bool = True,
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
      allow_pallas: False keeps 'auto' off the Pallas kernel — needed when
        the caller's program compiles under multi-device GSPMD jit, which
        cannot partition custom calls (same convention as the model flag).

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
            allow_pallas
            and jax.default_backend() in ("tpu", "axon")
            and n <= 16384
            and _pallas_block_ok(b, n, num_samples)
        ):
            method = "pallas"
        else:
            try:
                fits = bool(b * n * n * 4 <= max_distmat_bytes)
            except Exception:
                # symbolic batch dim (jax.export shape polymorphism): the
                # byte budget is inconclusive — take the O(n)-memory
                # formulation, which is safe at any deployment batch
                fits = False
            method = "distmat" if fits else "stream"

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
    layout: str = "bnc",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FPS returning (indices (b, k), sampled points (b, k, 3)).

    On TPU the Pallas kernel emits the selected coordinates directly (it
    extracts them every iteration anyway); a post-hoc ``take_along_axis``
    row gather costs ~10 ms/batch at 256x2048 — more than the sampling
    itself. Other backends fall back to indices + gather.

    ``layout='bcn'`` takes plane-major (b, 3, n) points (the kernel's
    native orientation — it consumes coordinate planes; pairs with
    ``voxel_downsample_batch(layout='bcn')`` to skip the interleave/split
    copies between the two kernels). The sampled output stays (b, k, 3):
    it feeds the model, whose matmuls want coordinates minor.

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
    if layout not in ("bnc", "bcn"):
        raise ValueError(f"Unknown layout {layout!r}")
    b = points.shape[0]
    n = points.shape[2] if layout == "bcn" else points.shape[1]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), bool)
    if chains > 1:
        if layout == "bcn":  # stripe-reshape logic is row-major; convert
            points = jnp.swapaxes(points, 1, 2)
        return _blocked_fps_and_gather(points, num_samples, valid_mask, chains)
    if (
        jax.default_backend() in ("tpu", "axon")
        and n <= 16384
        and _pallas_block_ok(b, n, num_samples)
    ):
        from pointcloudprocessing_tpu.ops.pallas.fps import fps_pallas_with_points

        start = _seed_indices(valid_mask, start_index)
        return fps_pallas_with_points(points, num_samples, valid_mask, start,
                                      layout=layout)
    if layout == "bcn":
        points = jnp.swapaxes(points, 1, 2)
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


def stride_sample_and_gather(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    layout: str = "bnc",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """O(n) stratified sampling along the INPUT ORDER — the serving-path
    alternative to FPS's serial selection loop.

    Measured on v5e (sampler stage over the voxel output): at
    256x2048->1024 it is at par with the FPS kernel (the banded reduction
    it rides costs about what FPS does there); at 64x8192->1024 it is
    ~1.5x faster, and the gap grows with n — FPS is O(k*n) serial,
    this is O(n).

    On spatially ordered input (the Morton-ordered voxel output,
    ops/voxel.py) the index axis is a space-filling-curve traversal, so
    evenly spaced picks along it are a stratified spatial sample —
    covering radius within ~1.5-2x of exact FPS on volume data
    (test_preprocess_ops.py). On UNORDERED input this is just a uniform
    subsample; use FPS there.

    Requires the valid rows to be packed FIRST (true for voxel output).
    With fewer than ``num_samples`` valid rows the bucket map skips output
    slots; skipped slots are forward-filled with the previous pick
    (repeating valid points — the same degraded-input semantics as the FPS
    path), so the output never contains phantom all-zero points.

    Formulation: valid row j maps to monotone bucket floor(j*k/nv); the
    first row of each bucket is extracted with the banded 'first'-mode
    segment reduction (ops/pallas/voxel_reduce.py) — the same machinery as
    voxel downsampling, no gather/scatter anywhere.

    Returns (indices (b, k) int32, sampled (b, k, 3) f32).

    ``layout='bcn'`` accepts (b, 3, n) planes for interface parity with the
    FPS path; the bucket machinery rides the AoS segment reduce, so this
    converts at entry (one transpose — the reduce kernel's plane-major
    twin measured slower, docs/PERF.md).
    """
    if layout == "bcn":
        points = jnp.swapaxes(points, 1, 2)
    elif layout != "bnc":
        raise ValueError(f"Unknown layout {layout!r}")
    b, n = points.shape[:2]
    k = num_samples
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), bool)
    nv = jnp.maximum(jnp.sum(valid_mask, axis=1), 1)  # (b,)
    j = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    bucket = jnp.minimum((j * k) // nv[:, None], k - 1)
    bucket = jnp.where(valid_mask, bucket, n - 1)  # park invalids at the end
    is_new = jnp.concatenate(
        [jnp.ones((b, 1), bool), bucket[:, 1:] != bucket[:, :-1]], axis=1
    ) & valid_mask
    w = is_new.astype(points.dtype)
    # channels: xyz, source index, and a filled flag — the flag survives the
    # segment sum as exactly 1.0 for buckets that received a first row, 0.0
    # for buckets the nv < k bucket map skipped
    data = jnp.concatenate(
        [
            points * w[..., None],
            j.astype(points.dtype)[..., None] * w[..., None],
            w[..., None],
        ],
        axis=-1,
    )
    if jax.default_backend() in ("tpu", "axon"):
        from pointcloudprocessing_tpu.ops.pallas.voxel_reduce import (
            sorted_segment_reduce_pallas,
        )

        reduced = sorted_segment_reduce_pallas(data, bucket)
    else:
        reduced = jax.vmap(
            lambda d, r: jax.ops.segment_sum(d, r, num_segments=n)
        )(data, bucket)
    picks = reduced[:, :k, :4]
    filled = reduced[:, :k, 4:5] > 0.5

    # forward-fill skipped buckets (possible only when nv < k — pigeonhole:
    # with nv >= k every bucket receives a first row) with the previous
    # pick. Gated behind lax.cond: the fill itself is pure vector work, but
    # any full-length scan over k costs real time (the original
    # associative_scan formulation measured 2.4 ms/step at 256x2048 in the
    # e2e pipeline — 40% of the whole step — lowering to padded
    # slice/concat stages; docs/PERF.md), and serving batches essentially
    # never hit the degenerate case.
    def _ffill(operands):
        p, f = operands
        # log-shift take-right-if-filled: k is static, so each stage is a
        # pad+slice (no dynamic slicing) and two selects
        shift = 1
        while shift < k:
            pv = jnp.pad(p, ((0, 0), (shift, 0), (0, 0)))[:, :-shift]
            fv = jnp.pad(f, ((0, 0), (shift, 0), (0, 0)))[:, :-shift]
            p = jnp.where(f, p, pv)
            f = f | fv
            shift *= 2
        return p

    all_full = jnp.all(nv >= k)
    picks = jax.lax.cond(
        all_full, lambda ops: ops[0], _ffill, (picks, filled)
    )
    sampled = picks[..., :3]
    idx = picks[..., 3].astype(jnp.int32)
    return idx, sampled

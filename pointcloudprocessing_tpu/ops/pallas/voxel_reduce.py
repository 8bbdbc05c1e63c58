"""Pallas TPU kernels for the voxel segment reduction.

After the voxel sort, reducing point rows into their dense segment ids is a
one-hot contraction ``einsum('bnk,bnd->bkd')``. XLA materializes the
(b, n, n) one-hot in HBM (4 GB at 256x2048 — ~18 ms of pure traffic); these
kernels generate one-hot slabs in VMEM on the fly and feed the MXU
directly, so HBM traffic collapses to the (b, n, d) operands.

Two variants:

- ``segment_reduce_pallas`` — dense: every (K_TILE, n) slab is built and
  contracted; works for ANY rank assignment. Measured v5e, 256x2048x4:
  ~2 ms vs ~18 ms for the XLA einsum.
- ``sorted_segment_reduce_pallas`` — banded: requires rank MONOTONE
  non-decreasing along rows (true by construction for the voxel pipeline,
  where rank is a cumsum over sort order). The rows feeding output tile
  [k0, k0+K) then form one contiguous band, whose chunk bounds are
  precomputed in XLA and read by the kernel, which loops only over a
  tile's own chunks — compares drop from n^2 to ~n*K per cloud.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _reduce_kernel(rank_ref, data_ref, out_ref, *, k_tile):
    ik = pl.program_id(1)
    rank = rank_ref[0]  # (1, n) int32
    data = data_ref[0]  # (n, d) f32
    n = rank.shape[1]
    k_base = ik * k_tile
    # one-hot slab for this output tile, built in VMEM
    segment_ids = jax.lax.broadcasted_iota(jnp.int32, (k_tile, n), 0) + k_base
    onehot = (segment_ids == rank).astype(jnp.bfloat16)  # (k_tile, n)
    # TWO bf16 passes with a hi/lo-split data operand: the one-hot side is
    # exact in bf16 (0/1), so only the data needs splitting — a single
    # default-precision pass truncates f32 coordinates to bf16 (~4e-3
    # relative; 6 cm voxel-centroid error at 30 m scenes, measured), while
    # hi+lo recovers ~2^-16 relative (~0.01 mm) at 2 MXU passes instead of
    # HIGHEST's 6. The split MUST live inside the kernel: in the XLA graph
    # the algebraic simplifier treats f32(bf16(x)) as x and folds the lo
    # term to zero (observed — outputs came back exactly bf16-quantized).
    data_hi = data.astype(jnp.bfloat16)
    data_lo = (data - data_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # hi and lo ride side by side in ONE contraction: d doubles to 2d but
    # stays far under the 128-lane MXU pad, so the (k_tile, n) one-hot —
    # the expensive operand — streams through the MXU once, not twice
    # (two separate dots measured ~30% slower end-to-end)
    both = jnp.concatenate([data_hi, data_lo], axis=1)  # (n, 2d)
    acc = jnp.dot(onehot, both, preferred_element_type=jnp.float32)
    d = data.shape[1]
    out_ref[0] = acc[:, :d] + acc[:, d:]


def segment_reduce_pallas(
    data: jnp.ndarray, rank: jnp.ndarray, k_tile: int = 512
) -> jnp.ndarray:
    """Per-cloud dense-segment sum: out[b, k, :] = sum over rows with
    rank[b, i] == k of data[b, i, :]. ``rank`` values must lie in [0, n).

    data: (b, n, d) f32 (d small — xyz + carried columns), rank: (b, n) i32.
    Returns (b, n, d) f32. Products are exact (0 or the row value); the
    accumulation order differs from the XLA einsum by a few ulp at most.
    """
    b, n, d = data.shape
    while n % k_tile:
        k_tile //= 2
    if k_tile < 8:  # Mosaic: sublane block must be a multiple of 8 or full
        k_tile = n

    kernel = functools.partial(_reduce_kernel, k_tile=k_tile)
    # rank rides as (b, 1, n) so its block's trailing dims are (1, n) —
    # Mosaic requires trailing block dims be tile-multiples or span the array
    return pl.pallas_call(
        kernel,
        grid=(b, n // k_tile),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda ib, ik: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda ib, ik: (ib, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, k_tile, d), lambda ib, ik: (ib, ik, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        interpret=_interpret(),
    )(rank.astype(jnp.int32)[:, None, :], data.astype(jnp.float32))


def _banded_kernel(
    bounds_ref, rank_ref, data_ref, out_ref, *, k_tile, chunk
):
    """One program per CLOUD; python loop over output tiles; per tile a
    ``fori_loop`` over only the row chunks whose ranks intersect the tile
    (bounds precomputed in XLA from the monotone rank array)."""
    data = data_ref[0]  # (n, d) f32
    n, d = data.shape
    n_tiles = n // k_tile

    for t in range(n_tiles):
        c_lo = bounds_ref[0, 0, t]
        c_hi = bounds_ref[0, 0, n_tiles + t]
        seg_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (k_tile, chunk), 0)
            + t * k_tile
        )

        def chunk_body(c, acc, seg_ids=seg_ids):
            off = pl.multiple_of(c * chunk, 128)
            rk = rank_ref[0, 0:1, pl.ds(off, chunk)]  # (1, C)
            onehot = (seg_ids == rk).astype(jnp.bfloat16)  # (K, C)
            dt = data_ref[0, pl.ds(off, chunk), :]  # (C, d) f32
            # hi/lo bf16 split IN-KERNEL (XLA folds f32(bf16(x)) -> x and
            # would zero the lo term — see _reduce_kernel)
            dt_hi = dt.astype(jnp.bfloat16)
            dt_lo = (dt - dt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            both = jnp.concatenate([dt_hi, dt_lo], axis=1)  # (C, 2d)
            return acc + jnp.dot(
                onehot, both, preferred_element_type=jnp.float32
            )

        acc = jax.lax.fori_loop(
            c_lo, c_hi, chunk_body,
            jnp.zeros((k_tile, 2 * d), jnp.float32),
        )
        out_ref[0, t * k_tile:(t + 1) * k_tile, :] = acc[:, :d] + acc[:, d:]


def sorted_segment_reduce_pallas(
    data: jnp.ndarray,
    rank: jnp.ndarray,
    k_tile: int = 256,
    chunk: int = 256,
) -> jnp.ndarray:
    """Banded variant of :func:`segment_reduce_pallas` for MONOTONE rank.

    ``rank`` must be non-decreasing along axis 1 per cloud (the voxel
    pipeline's dense segment ids are — rank is a cumsum over sort order).
    Same output contract and hi/lo-split accuracy as the dense kernel;
    compares drop from n^2 to ~n * k_tile per cloud.
    """
    b, n, d = data.shape
    while n % k_tile or k_tile % 8:
        k_tile //= 2
        if k_tile < 8:
            return segment_reduce_pallas(data, rank)
    while n % chunk or chunk % 128:
        chunk //= 2
        if chunk < 128:
            return segment_reduce_pallas(data, rank)
    rank = rank.astype(jnp.int32)
    n_tiles = n // k_tile

    # band bounds per output tile, from monotonicity: rows with rank in
    # [k0, k0 + K) occupy [sum(rank < k0), sum(rank < k0 + K))
    k0 = jnp.arange(n_tiles, dtype=jnp.int32) * k_tile
    below_lo = jnp.sum(rank[:, :, None] < k0[None, None, :], axis=1)
    below_hi = jnp.sum(
        rank[:, :, None] < (k0 + k_tile)[None, None, :], axis=1
    )
    c_lo = below_lo // chunk
    c_hi = (below_hi + chunk - 1) // chunk
    bounds = jnp.concatenate([c_lo, jnp.maximum(c_hi, c_lo)], axis=1)

    kernel = functools.partial(_banded_kernel, k_tile=k_tile, chunk=chunk)
    # the kernel's own blocks are small (~0.5 MB double-buffered), but XLA
    # promotes the custom call's whole operands/outputs into scoped VMEM
    # when they fit-ish; at 64x8192 that trips the default 16 MiB scoped
    # limit — raise the per-kernel cap so placement succeeds
    return pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 2 * n_tiles), lambda ib: (ib, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n), lambda ib: (ib, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n, d), lambda ib: (ib, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n, d), lambda ib: (ib, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        interpret=_interpret(),
    )(
        bounds.astype(jnp.int32)[:, None, :],
        rank[:, None, :],
        data.astype(jnp.float32),
    )

"""VMEM-resident gather+max/min Pallas kernel (channels-first lane gathers).

The factored EdgeConv inference path (models/dgcnn.py::_FactoredEdgeBlock)
needs, per layer, ``qmax[i, c] = max_j q[idx[i, j], c]`` and the matching
min — a k-sparse selection that the one-hot MXU formulation pays a dense
(n)-contraction for (FLOPs ``b*n*k*n*w``; docs/PERF.md "DGCNN hotspots").

This kernel holds one cloud's features VMEM-resident in channels-first
layout ``qT (w, n)`` and performs the selection with Mosaic
``tpu.dynamic_gather`` along lanes, fusing the neighbor max/min so nothing
(b, n, k, w)-shaped ever exists:

- ``tpu.dynamic_gather`` shuffles within ONE vreg of source lanes (128) and
  requires source/index/output same-shape, so the n-lane gather decomposes
  into (output 128-lane tiles) x (source 128-lane chunks) single-vreg
  gathers combined by chunk-match selects.
- Mosaic lowers LANE gathers for 32-bit types only ("8- and 16-bit dynamic
  gather only supported along 2nd minor dimension"), so bf16 sources upcast
  to f32 in VMEM; the selection itself is therefore EXACT in every dtype
  (bf16 -> f32 -> bf16 round-trips bit-exactly, max/min create no new
  values).

Measured (docs/exp/gather_kernel_bench.py, b64 x n1024 x k20, TPU v5e):
w=64 runs 2.6 ms vs the one-hot matmul's 4.3 ms (1.66x); at w=128 (5.7 vs
4.9) and w=256 (11.0 vs 8.7) the one-hot MXU path wins — the kernel's VPU
work scales linearly with w while the MXU amortizes it. The dispatcher
therefore uses the kernel only for ``w <= _LANE_WIDTH_MAX`` and falls back
to ``ops.gather.gather_rows`` + max/min elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANE_WIDTH_MAX = 96  # one-hot matmul wins above this width (measured)
_NEG = float(np.finfo(np.float32).min)


def _gather_lanes(x2d: jnp.ndarray, ids2d: jnp.ndarray) -> jnp.ndarray:
    """tpu.dynamic_gather along lanes: out[s, l] = x2d[s, ids2d[s, l]].

    Direct ``lax.gather``: ``take_along_axis`` promotes indices to i32 for
    negative-index handling, but the Mosaic op wants index bitwidth ==
    data bitwidth plus an in-bounds promise.
    """
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    itype = jnp.int16 if x2d.dtype.itemsize == 2 else jnp.int32
    return jax.lax.gather(
        x2d,
        ids2d.astype(itype)[..., None],
        dn,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _lane_kernel(k: int, idx_ref, qT_ref, mx_ref, mn_ref):
    qT = qT_ref[0]  # (w, n)
    w, n = qT.shape
    n_chunks = n // 128
    chunks = [
        qT[:, m * 128:(m + 1) * 128].astype(jnp.float32)
        for m in range(n_chunks)
    ]
    for t in range(n_chunks):  # output lane tiles
        mx = jnp.full((w, 128), _NEG, jnp.float32)
        mn = jnp.full((w, 128), -_NEG, jnp.float32)
        for j in range(k):
            ids = idx_ref[0, j, t * 128:(t + 1) * 128]  # (128,) int32
            lo = jnp.broadcast_to((ids % 128)[None, :], (w, 128))
            hi = ids // 128
            g = jnp.full((w, 128), _NEG, jnp.float32)
            for m in range(n_chunks):
                got = _gather_lanes(chunks[m], lo)
                g = jnp.where(
                    jnp.broadcast_to((hi == m)[None, :], (w, 128)), got, g
                )
            mx = jnp.maximum(mx, g)
            mn = jnp.minimum(mn, g)
        mx_ref[0, :, t * 128:(t + 1) * 128] = mx.astype(qT.dtype)
        mn_ref[0, :, t * 128:(t + 1) * 128] = mn.astype(qT.dtype)


def _lane_maxmin(q: jnp.ndarray, idx: jnp.ndarray, interpret: bool):
    b, n, w = q.shape
    k = idx.shape[-1]
    qT = jnp.swapaxes(q, 1, 2)  # (b, w, n)
    idxT = jnp.swapaxes(idx.astype(jnp.int32), 1, 2)  # (b, k, n)
    mxT, mnT = pl.pallas_call(
        functools.partial(_lane_kernel, k),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, w, n), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, w, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, w, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, w, n), qT.dtype),
            jax.ShapeDtypeStruct((b, w, n), qT.dtype),
        ],
        interpret=interpret,
    )(idxT, qT)
    return jnp.swapaxes(mxT, 1, 2), jnp.swapaxes(mnT, 1, 2)


def lane_kernel_applicable(n: int, w: int, dtype) -> bool:
    """Shapes/dtypes the Mosaic lane kernel handles AND wins at (measured
    crossover w <= 96; n must tile into 128-lane vregs; VMEM holds ~3
    (w, n) copies — cap n*w so the per-cloud block stays well under 4 MB)."""
    return (
        n % 128 == 0
        and 0 < w <= _LANE_WIDTH_MAX
        and n * w * 8 <= 4 * 1024 * 1024
        and dtype in (jnp.bfloat16, jnp.float32)
    )


def gather_maxmin(
    q: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    allow_pallas: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point neighbor max and min: q (b, n, w), idx (b, n, k) ->
    (qmax, qmin) each (b, n, w), exact in every dtype.

    TPU with ``allow_pallas`` takes the VMEM lane kernel when
    :func:`lane_kernel_applicable` (no (b, n, k, w) tensor exists);
    otherwise the selection routes through ``ops.gather.gather_rows``
    (one-hot MXU matmul on TPU, native gather elsewhere) + max/min.
    ``interpret=True`` forces the Pallas path in interpreter mode (CPU
    correctness tests).
    """
    b, n, w = q.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if interpret or (
        allow_pallas and on_tpu and lane_kernel_applicable(n, w, q.dtype)
    ):
        return _lane_maxmin(q, idx, interpret)
    from pointcloudprocessing_tpu.ops.gather import gather_rows

    g = gather_rows(q, idx)  # (b, n, k, w)
    return jnp.max(g, axis=2), jnp.min(g, axis=2)

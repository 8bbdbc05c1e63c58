"""Fused ``dense -> BatchNorm -> relu -> global max-pool`` Pallas kernels.

TPU training path for the three (b, n, 1024) pooled chains (both T-Nets'
``conv_layer_3`` and the trunk's ``mlp_2_3`` — reference
``pointnet/PointNet.py:236-248, 418-429``). The jnp formulation in
``models/fused_pool.py`` already avoids (b, n, C) *gradient* tensors, but
XLA still runs ~4 separate full passes over the (b, n, C) pre-activation
per chain (BN-stats reduce, max+argmax reduce, winner-xhat gather, and the
backward one-hot build) — and a b32/1024-pt bf16 train-step trace shows
those passes saturate the VPU and HBM *simultaneously* at ~250 us/chain.
The win here therefore comes from cutting PASSES, not just bytes:

- BN batch statistics never touch the (b, n, C) tensor at all: the caller
  (models/fused_pool.py) computes them from the Gram matrix ``x^T x`` —
  ``E[pre] = (1^T x) W / N`` and ``E[pre^2]_c = W_c^T (x^T x) W_c / N`` —
  a (c_in, c_in) contraction that costs ~1% of the main matmul.
- The forward kernel is a single pass: matmul tile -> folded BN affine ->
  relu -> ONE packed integer max-reduce that yields the pooled value and
  the first-index argmax together. Packing: relu output is >= 0, so its
  f32 bits order like the float; the 13 low mantissa bits are replaced
  with ``8191 - point_index``. An integer max then picks the largest
  truncated activation, ties broken toward the smallest index (the jnp
  path's first-occurrence argmax). Truncation keeps 10 mantissa bits —
  finer than the bf16 the activations already round through.
- The backward kernel regenerates the winner one-hot in VMEM from the
  argmax (one compare against an iota — no (b, n, C) HBM tensor) and runs
  the two essential MXU contractions: ``dx = a_mat @ W^T + x @ M + row``
  and ``dk_sparse = x^T @ a_mat``.

Together: x is read once per kernel, the only (b, n, C)-sized arrays live
in VMEM tiles, and the VPU sees one elementwise chain plus one reduce in
the forward instead of four separate full-tensor passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: widest packed-argmax index field: 13 bits = clouds up to 8192 points.
#: the actual field is ceil(log2(n)) bits, keeping 23 - ceil(log2(n))
#: mantissa bits of the pooled value (>= 10 at the 8192-pt flagship width).
_MAX_IDX_BITS = 13


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pick_tiles(b: int, n: int) -> tuple[int, int]:
    """Largest (TB, TN) with TB | b, TN | n, TB*TN rows <= 1024 (4 MB f32
    pre-activation tile at C=1024)."""
    tb = next((t for t in (8, 4, 2, 1) if b % t == 0))
    tn = next((t for t in (1024 // tb, 256, 128, 64) if n % t == 0), None)
    if tn is None:
        raise ValueError(f"n={n} has no supported tile")
    return tb, tn


def supported(b: int, n: int, c_in: int, c_out: int) -> bool:
    """Shapes the kernels handle on real hardware (lane-aligned tiles; n
    bounded by the packed-argmax index field)."""
    if b < 1 or n % 64 != 0 or n > (1 << _MAX_IDX_BITS):
        return False
    return c_in % 128 == 0 and c_out % 128 == 0


def _fwd_kernel(x_ref, w_ref, a_ref, c_ref, packed_ref, *, tn: int, idx_mask: int):
    j = pl.program_id(1)
    tb = x_ref.shape[0]
    c = w_ref.shape[1]

    x2d = x_ref[:].reshape(tb * tn, x_ref.shape[2])
    pre = jax.lax.dot_general(
        x2d, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = pre * a_ref[:] + c_ref[:]
    r = jnp.maximum(y, 0.0).reshape(tb, tn, c)
    # r >= 0 -> f32 bit pattern orders like the float; round to the nearest
    # representable with the low mantissa bits cleared (carry into the
    # exponent IS correct float rounding), then store the inverted point
    # index there: ONE integer max-reduce returns the pooled value and the
    # first-index argmax together
    ri = pltpu.bitcast(r, jnp.int32)
    ri = (ri + ((idx_mask + 1) >> 1)) & ~idx_mask
    idx = jax.lax.broadcasted_iota(jnp.int32, (tb, tn, c), 1) + j * tn
    packed = ri | (idx_mask - idx)
    tile_max = jnp.max(packed, axis=1)  # (tb, c)

    @pl.when(j == 0)
    def _init():
        packed_ref[:] = tile_max

    @pl.when(j != 0)
    def _combine():
        packed_ref[:] = jnp.maximum(packed_ref[:], tile_max)


@jax.jit
def pooled_chain_forward(x, kernel, a, c_row):
    """Fused ``relu((x @ kernel) * a + c_row)`` + max/argmax over points.

    x (b, n, c_in); kernel (c_in, c); ``a``/``c_row`` (c,) — the BN affine
    folded per channel (``a = gamma/sigma``, ``c_row = beta - mean * a``),
    computed by the caller (batch statistics come from the Gram matrix,
    never from the pre-activation). Returns (pooled (b, c) f32 rounded to
    23 - ceil(log2(n)) mantissa bits, argmax (b, c) i32, first index).
    """
    b, n, c_in = x.shape
    c = kernel.shape[1]
    tb, tn = _pick_tiles(b, n)
    idx_mask = (1 << max((n - 1).bit_length(), 1)) - 1
    packed = pl.pallas_call(
        functools.partial(_fwd_kernel, tn=tn, idx_mask=idx_mask),
        grid=(b // tb, n // tn),
        in_specs=[
            pl.BlockSpec((tb, tn, c_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.int32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c_in * c,
            bytes_accessed=x.size * x.dtype.itemsize + 8 * b * c,
            transcendentals=0,
        ),
    )(
        x,
        kernel.astype(x.dtype),
        a.reshape(1, c).astype(jnp.float32),
        c_row.reshape(1, c).astype(jnp.float32),
    )
    pooled = jax.lax.bitcast_convert_type(packed & ~idx_mask, jnp.float32)
    argmax = idx_mask - (packed & idx_mask)
    return pooled, argmax


def _bwd_kernel(
    x_ref, wt_ref, coef_ref, argmax_ref, m_ref, row_ref,
    dx_ref, dk_ref,
    *, tn: int, cdtype,
):
    j = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (j == 0)
    tb, _, c_in = x_ref.shape
    c = wt_ref.shape[0]

    @pl.when(first)
    def _zero():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    idx = jax.lax.broadcasted_iota(jnp.int32, (tb, tn, c), 1) + j * tn
    onehot = idx == argmax_ref[:][:, None, :]
    a_mat = jnp.where(onehot, coef_ref[:][:, None, :], 0.0).astype(cdtype)
    a2d = a_mat.reshape(tb * tn, c)
    x2d = x_ref[:].reshape(tb * tn, c_in)

    dx = jax.lax.dot_general(
        a2d, wt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx += jax.lax.dot_general(
        x2d, m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx += row_ref[:]
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(tb, tn, c_in)

    dk_ref[:] += jax.lax.dot_general(
        x2d, a2d,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def pooled_chain_backward(x, kernel, coef, argmax, m_small, const_row):
    """Backward data path. Returns (dx (b, n, c_in) like x,
    dk_sparse (c_in, c) f32).

    ``coef`` is the per-(cloud, channel) winner gradient coefficient
    (dy_w * gamma / sigma); ``m_small``/``const_row`` the matmul-factored
    dense BN-statistics term (models/fused_pool.py). Pass zeros for the
    running-stats mode.
    """
    b, n, c_in = x.shape
    c = kernel.shape[1]
    tb, tn = _pick_tiles(b, n)
    cdtype = x.dtype
    dx, dk = pl.pallas_call(
        functools.partial(_bwd_kernel, tn=tn, cdtype=cdtype),
        grid=(b // tb, n // tn),
        in_specs=[
            pl.BlockSpec((tb, tn, c_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tn, c_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c_in), x.dtype),
            jax.ShapeDtypeStruct((c_in, c), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * b * n * c_in * c,
            bytes_accessed=2 * 2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        x,
        jnp.swapaxes(kernel, 0, 1).astype(cdtype),
        coef.astype(jnp.float32),
        argmax,
        m_small.astype(cdtype),
        const_row.reshape(1, c_in).astype(jnp.float32),
    )
    return dx, dk

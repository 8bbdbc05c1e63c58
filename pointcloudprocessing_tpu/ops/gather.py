"""Row gathers expressed as one-hot MXU matmuls.

XLA TPU lowers a batched row gather (``take_along_axis`` over axis 1) to a
per-index DMA loop — latency-bound at ~3 us per 16 indices regardless of
row width (measured: 49 ms to gather 256x16384 rows from (256, 1024, 3)).
The same selection written as ``one_hot(idx) @ x`` lets XLA fuse the
iota-compare into the dot operand and the MXU performs it at matmul speed:
4.5 ms for the identical shape — 11x (docs/exp/pn2_hotspot_bench.py;
docs/PERF.md "PointNet++ hotspots").

Exactness: a one-hot row has exactly one 1.0, so the contraction's sum has
one nonzero term — selecting a bf16 value through a bf16 matmul is EXACT.
f32 sources go through a hi/lo double-bf16 split (hi = bf16(x), lo =
bf16(x - hi)), reconstructing to ~2^-17 relative error — the same split
the voxel kernels use (docs/PERF.md "Banded segment reduce").

This is the default TPU path for PointNet++ grouping; CPU keeps the native
gather (fast there, and bit-exact for the numpy-golden tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _onehot_select(x_bf16: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """(b, n, c) bf16, (b, g) int -> (b, g, c) bf16 exact row selection."""
    n = x_bf16.shape[1]
    oh = jax.nn.one_hot(flat_idx, n, dtype=jnp.bfloat16)
    # bf16 output is exact: one nonzero product per output element
    return jnp.einsum("bgn,bnc->bgc", oh, x_bf16)


def gather_rows_matmul(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x (b, n, c), idx (b, ...) int -> (b, ..., c) via one-hot matmul.

    bf16 sources: exact. f32 sources: hi/lo double-bf16, ~2^-17 relative.
    Integer sources fall back to the native gather (labels are not hot).
    """
    b, n, c = x.shape
    flat = idx.reshape(b, -1)
    out_shape = (*idx.shape, c)
    if x.dtype == jnp.bfloat16:
        return _onehot_select(x, flat).reshape(out_shape)
    if x.dtype == jnp.float32:
        # NOT x.astype(bf16).astype(f32): XLA's excess-precision
        # simplification (xla_allow_excess_precision, default on) folds the
        # f32->bf16->f32 convert pair to identity, making lo == 0 — the
        # gather silently degrades to single-bf16 accuracy (caught by
        # tools/tpu_acceptance.py::check_onehot_gather, round 4).
        # lax.reduce_precision is the unfoldable rounding op.
        hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
        hi = hi_f32.astype(jnp.bfloat16)
        lo = (x - hi_f32).astype(jnp.bfloat16)
        # ONE einsum over [hi ++ lo]: the fused one-hot operand is
        # regenerated per contraction, so two separate selections pay the
        # iota-compare twice (measured ~2x at the PN++ SA1 shape)
        both = _onehot_select(jnp.concatenate([hi, lo], axis=-1), flat)
        out = (
            both[..., :c].astype(jnp.float32)
            + both[..., c:].astype(jnp.float32)
        )
        return out.reshape(out_shape)
    flat_rows = jnp.take_along_axis(x, flat[..., None], axis=1)
    return flat_rows.reshape(out_shape)


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatched batched row gather: x (b, n, c), idx (b, ...) ->
    (b, ..., c). TPU takes the one-hot matmul (11x the native gather); other
    backends keep ``take_along_axis`` (fast there, bit-exact)."""
    if jax.default_backend() in ("tpu", "axon"):
        return gather_rows_matmul(x, idx)
    b = x.shape[0]
    flat = idx.reshape(b, -1)
    rows = jnp.take_along_axis(x, flat[..., None], axis=1)
    return rows.reshape(*idx.shape, x.shape[-1])

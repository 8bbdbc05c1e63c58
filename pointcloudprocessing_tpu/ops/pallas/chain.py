"""Pallas TPU kernels for PointNet's hot inference patterns.

Two memory-bound patterns dominate PointNet serving once the matmuls hit the
MXU:

1. ``pointwise-MLP(c0->c1->c2->c3) -> global max over points`` — used three
   times (input T-Net conv chain, feature T-Net conv chain, shared trunk,
   reference PointNet.py:418-429 and :236-248). XLA materializes the
   (n, 1024) activation in HBM between the matmul and the reduce; at 8 KB per
   point that IS the bandwidth bill (~17 GB/step at batch 2048).
   ``fused_chain_max`` keeps the whole chain + running max in VMEM per tile:
   HBM traffic drops from O(n * c3) to O(n * c0 + c3).

2. The segmentation head's per-point chain 512->256->128->128->P
   (PointNet.py:275-290). ``fused_seg_head`` runs all five layers (with the
   per-cloud global contribution pre-added into the first bias) and the final
   softmax in one kernel — intermediates never leave VMEM.

Blocks tile BOTH the batch (TB clouds) and the point axis (TN points) so the
per-step matmuls are (TB*TN, c) x (c, f) — large enough to saturate the MXU;
the per-cloud max is a within-block reshape+reduce with a running-max
accumulator across point tiles.

BatchNorm is inference-folded into the matmul weights beforehand
(:func:`fold_bn`). On non-TPU backends (CPU tests) the kernels run in Pallas
interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloudprocessing_tpu.core.constants import KERAS_BN_EPSILON


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fold_bn(kernel, gamma, beta, mean, var, eps: float = KERAS_BN_EPSILON):
    """Fold inference BatchNorm into the preceding (bias-free) matmul.

    y = gamma * (x@W - mean)/sqrt(var+eps) + beta  ==  x@W' + b'
    with W' = W * s (per output column), b' = beta - mean * s.
    """
    s = gamma / jnp.sqrt(var + eps)
    return kernel * s[None, :], beta - mean * s


def _pick_tile(n: int, candidates) -> int | None:
    for tile in candidates:
        if n % tile == 0:
            return tile
    return None


def _tiles(b: int, n: int, vmem_width: int) -> tuple[int, int]:
    """(TB, TN) such that TB*TN*vmem_width f32 stays ~<= 8 MB — big blocks so
    the (TB*TN, c) matmuls saturate the MXU. Raises for point counts with no
    small divisor (a full-n block would blow VMEM on device)."""
    budget = (8 * 1024 * 1024) // 4 // max(vmem_width, 1)
    tn = _pick_tile(n, tuple(t for t in (256, 128, 512, 64, 32, 16, 8) if t <= max(budget, 8)))
    if tn is None:
        raise ValueError(
            f"Point count n={n} has no tile divisor in [8, 512]; pad the "
            "cloud to a multiple of 8 points to use the fused Pallas kernels."
        )
    tb = max(1, min(b, budget // tn))
    tb = _pick_tile(b, tuple(t for t in (32, 16, 8, 4, 2, 1) if t <= tb)) or 1
    return tb, tn


# ---------------------------------------------------------------------------
# fused chain + max
# ---------------------------------------------------------------------------


def _chain_max_kernel(x_ref, w1, b1, w2, b2, w3, b3, out_ref, *, compute_dtype, tb, tn):
    it = pl.program_id(1)
    x = x_ref[...]  # (TB, TN, c0)
    c0 = x.shape[-1]
    flat = x.reshape(tb * tn, c0)
    if compute_dtype is not None:
        flat = flat.astype(compute_dtype)

    def layer(h, w_ref, b_ref):
        w = w_ref[:]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        out = jnp.dot(h, w, preferred_element_type=jnp.float32) + b_ref[0]
        out = jnp.maximum(out, 0.0)
        if compute_dtype is not None:
            out = out.astype(compute_dtype)
        return out

    h = layer(flat, w1, b1)
    h = layer(h, w2, b2)
    h = layer(h, w3, b3).astype(jnp.float32)  # (TB*TN, c3)
    tile_max = jnp.max(h.reshape(tb, tn, -1), axis=1)  # (TB, c3)

    @pl.when(it == 0)
    def _():
        out_ref[:, 0, :] = tile_max

    @pl.when(it > 0)
    def _():
        out_ref[:, 0, :] = jnp.maximum(out_ref[:, 0, :], tile_max)


def fused_chain_max(x, weights, biases, compute_dtype=None):
    """relu-MLP chain over points then max-pool, in one kernel.

    Args:
      x: (b, n, c0).
      weights: [W1 (c0,c1), W2 (c1,c2), W3 (c2,c3)] (BN pre-folded).
      biases: [b1 (c1,), b2 (c2,), b3 (c3,)].
      compute_dtype: e.g. jnp.bfloat16 for MXU-native passes (accumulation
        stays f32); None = f32.

    Returns (b, c3) global features (max over the point axis).
    """
    b, n, c0 = x.shape
    c3 = weights[2].shape[1]
    tb, tn = _tiles(b, n, c3)
    biases2d = [jnp.asarray(bi)[None, :] for bi in biases]

    grid = (b // tb, n // tn)
    kernel = functools.partial(
        _chain_max_kernel, compute_dtype=compute_dtype, tb=tb, tn=tn
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tn, c0), lambda ib, it: (ib, it, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights[0].shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(biases2d[0].shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights[1].shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(biases2d[1].shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights[2].shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(biases2d[2].shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1, c3), lambda ib, it: (ib, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, c3), jnp.float32),
        interpret=_interpret(),
    )(x, weights[0], biases2d[0], weights[1], biases2d[1], weights[2], biases2d[2])
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# fused segmentation head
# ---------------------------------------------------------------------------


def _seg_head_kernel(
    x_ref, gb_ref, w1, w2, b2, w3, b3, w4, b4, w5, b5, out_ref, *, compute_dtype, tb, tn
):
    x = x_ref[...]  # (TB, TN, 64)
    flat = x.reshape(tb * tn, x.shape[-1])
    if compute_dtype is not None:
        flat = flat.astype(compute_dtype)

    def matmul(h, w_ref):
        w = w_ref[:]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        return jnp.dot(h, w, preferred_element_type=jnp.float32)

    def recast(h):
        return h.astype(compute_dtype) if compute_dtype is not None else h

    # layer 1: per-point matmul + per-cloud bias (global contribution + b1,
    # both BN-folded) — the virtual-concat trick at kernel level.
    c1 = w1.shape[1]
    h = matmul(flat, w1).reshape(tb, tn, c1) + gb_ref[:, 0, :][:, None, :]
    h = recast(jnp.maximum(h, 0.0)).reshape(tb * tn, c1)
    h = recast(jnp.maximum(matmul(h, w2) + b2[0], 0.0))
    h = recast(jnp.maximum(matmul(h, w3) + b3[0], 0.0))
    h = recast(jnp.maximum(matmul(h, w4) + b4[0], 0.0))
    logits = matmul(h, w5) + b5[0]
    probs = jax.nn.softmax(logits, axis=-1)
    out_ref[...] = probs.reshape(tb, tn, -1)


def fused_seg_head(x_64, global_bias, weights, biases, compute_dtype=None):
    """The five-layer segmentation head in one kernel.

    Args:
      x_64: (b, n, 64) per-point features.
      global_bias: (b, c1) per-cloud bias for layer 1 = global @ K_global +
        folded b1 (the tiled-global contribution).
      weights: [W1 (64,512), W2 (512,256), W3 (256,128), W4 (128,128),
        W5 (128,P)] with BN folded (W1's BN folds into W1 and global_bias);
        W5 is the raw softmax layer (bias in biases[-1]).
      biases: [b2, b3, b4, b5].

    Returns (b, n, P) softmax probabilities.
    """
    b, n, _ = x_64.shape
    p = weights[4].shape[1]
    c1 = weights[0].shape[1]
    tb, tn = _tiles(b, n, c1)
    biases2d = [jnp.asarray(bi)[None, :] for bi in biases]

    grid = (b // tb, n // tn)
    kernel = functools.partial(
        _seg_head_kernel, compute_dtype=compute_dtype, tb=tb, tn=tn
    )

    gb3 = global_bias[:, None, :]  # (b, 1, c1) for Mosaic block tiling
    args = [x_64, gb3]
    in_specs = [
        pl.BlockSpec((tb, tn, 64), lambda ib, it: (ib, it, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, 1, c1), lambda ib, it: (ib, 0, 0), memory_space=pltpu.VMEM),
    ]
    in_specs.append(pl.BlockSpec(weights[0].shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM))
    args.append(weights[0])
    for w, bi in zip(weights[1:], biases2d):
        in_specs.append(pl.BlockSpec(w.shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM))
        args.append(w)
        in_specs.append(pl.BlockSpec(bi.shape, lambda ib, it: (0, 0), memory_space=pltpu.VMEM))
        args.append(bi)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, tn, p), lambda ib, it: (ib, it, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, p), jnp.float32),
        interpret=_interpret(),
    )(*args)

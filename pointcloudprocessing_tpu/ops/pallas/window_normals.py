"""Pallas TPU kernel: windowed-kNN covariance sums for normal estimation.

The brute-force normals path (ops/normals.py) streams an (n, n) distance
matrix through HBM three times (build, approx_min_k, threshold-select); at
8x8192 that is ~6 GB of traffic per batch — the whole cost of the op. This
kernel exploits spatial locality in the point ORDER instead: when points
arrive sorted along a Morton curve (the voxel pipeline's output order,
ops/voxel.py), the k nearest neighbors of point i live almost surely inside
a contiguous index window [i - W, i + W]. Each program therefore

  1. loads one cloud's coordinate planes (VMEM-resident rows),
  2. computes a (Q, C) distance tile between Q consecutive queries and
     their C = Q + 2W surrounding candidates,
  3. picks a per-query neighborhood threshold as the smallest power-of-two
     multiple of the nearest-neighbor distance whose candidate count
     reaches k (a branch-free substitute for the k-th order statistic:
     count lands in [k, 2k), and one half-step refinement tightens it to
     [k, sqrt(2) k)),
  4. accumulates the masked first/second coordinate moments on the VPU.

Nothing n^2-sized ever exists, in HBM or VMEM: traffic is O(b n) and
compute is O(b n C) with C << n. The eigen-solve over the returned moment
sums stays in XLA (elementwise, ops/normals.py).

Coordinates must be pre-centered per cloud (raw second moments cancel
catastrophically in f32 for far-from-origin clouds); the XLA wrapper in
ops/normals.py does this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# count-threshold search levels: thresholds m * 2^s, s in [0, _LEVELS);
# covers a 2^12 = 4096x spread between nearest-neighbor and k-th-neighbor
# squared distance (64x in radius — beyond any sane scan density profile)
_LEVELS = 12


def _moment_sums_for_block(
    cx_ref, cy_ref, cz_ref, valid_ref, q0, start,
    *, q_block: int, c: int, k: int,
):
    """Shared block body: (Q, 10) moment sums for queries [q0, q0+Q).

    ``q0``/``start`` may be python ints (static offsets, per-cloud kernel)
    or traced scalars (per-block kernel); ``pl.ds`` handles both.
    """
    inf = jnp.float32(jnp.inf)
    kf = jnp.float32(k)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    # candidates: (1, C) row slices of the VMEM-resident cloud planes
    # (refs are (1, 1, n) — Mosaic block rule wants the sublane dim of
    # a block to be 8-divisible or the full array dim, hence the unit
    # axis)
    px = cx_ref[0, 0:1, pl.ds(start, c)]
    py = cy_ref[0, 0:1, pl.ds(start, c)]
    pz = cz_ref[0, 0:1, pl.ds(start, c)]
    pv = valid_ref[0, 0:1, pl.ds(start, c)] > 0.5

    # queries: (Q, 1) columns (sublane-major so d broadcasts to (Q, C))
    qx = jnp.swapaxes(cx_ref[0, 0:1, pl.ds(q0, q_block)], 0, 1)
    qy = jnp.swapaxes(cy_ref[0, 0:1, pl.ds(q0, q_block)], 0, 1)
    qz = jnp.swapaxes(cz_ref[0, 0:1, pl.ds(q0, q_block)], 0, 1)

    # exact squared differences (NOT the expanded |q|^2+|p|^2-2qp MXU
    # form: its rounding makes self-distances nonzero, which corrupts
    # the nearest-NON-SELF base m below)
    dx = qx - px
    dy = qy - py
    dz = qz - pz
    d = dx * dx + dy * dy + dz * dz  # (Q, C)
    dm = jnp.where(pv, d, inf)  # mask validity ONCE

    # nearest NON-SELF neighbor distance per query (d == 0 rows are the
    # query itself or an exact duplicate; duplicates still count as
    # neighbors below, they just must not zero the threshold base)
    m = jnp.min(jnp.where(dm > 0.0, dm, inf), axis=1, keepdims=True)

    # smallest level s in [0, _LEVELS) with count(dm <= m 2^s) >= k, by
    # BISECTION over the monotone count curve: ceil(log2(_LEVELS + 1)) = 4
    # counting passes instead of one per level (the linear scan was the
    # single largest VPU cost in the kernel). Invariant: hi always holds a
    # level whose count reaches k (seeded by the explicit top-level check),
    # lo - 1 never does.
    cnt_top = jnp.sum(
        jnp.where(dm <= m * jnp.float32(2.0 ** (_LEVELS - 1)), one, zero),
        axis=1, keepdims=True,
    )
    huge_m = jnp.float32(1e37)
    # fallback when the widest level misses k, AND when m itself is inf (a
    # query with no valid nonzero-distance candidate): m*2^s = inf would
    # admit every INVALID dm=inf candidate via inf <= inf, while the huge
    # finite threshold below selects exactly the valid candidates
    fallback = jnp.logical_or(cnt_top < kf, m > huge_m)
    lo = jnp.zeros_like(m)
    hi = jnp.full_like(m, float(_LEVELS - 1))
    for _ in range(4):
        mid = jnp.floor((lo + hi) * 0.5)
        cnt_mid = jnp.sum(
            jnp.where(dm <= m * jnp.exp2(mid), one, zero),
            axis=1, keepdims=True,
        )
        ok = cnt_mid >= kf
        hi = jnp.where(ok, mid, hi)
        lo = jnp.where(ok, lo, mid + one)
    s_star = hi
    # if no level reached k (short windows / < k valid points) select every
    # valid candidate, matching the brute-force path's kth = inf behavior.
    # The fallback must be FINITE: invalid candidates carry dm = inf, and
    # `inf <= inf` would admit them.
    huge = jnp.float32(3e38)
    thr = jnp.where(fallback, huge, m * jnp.exp2(s_star))
    # half-level refinement: count overshoot 2x -> sqrt(2)x
    thr_lo = m * jnp.exp2(s_star - 0.5)
    cnt_lo = jnp.sum(
        jnp.where(dm <= thr_lo, one, zero), axis=1, keepdims=True
    )
    thr = jnp.where(jnp.logical_and(cnt_lo >= kf, ~fallback), thr_lo, thr)

    sel = jnp.where(dm <= thr, one, zero)  # (Q, C)

    # Moment sums as ONE MXU contraction of sel against 10 feature rows
    # [1, x, y, z, xx, xy, xz, yy, yz, zz] — replacing ~12 full (Q, C) VPU
    # mul+reduce passes with (C)-length feature builds plus a matmul whose
    # cost is noise. Precision scheme (an earlier HIGHEST-precision attempt
    # measured ~2% SLOWER than the VPU chains — the 6 exact passes ate the
    # win):
    #  1. SHIFT candidates by the block's valid-candidate mean: covariance
    #     assembly is shift-invariant (cov = E[xx] - E[x]E[x]), so the
    #     returned first moments are relative to an arbitrary per-block
    #     shift — documented in the public contract. Shifting bounds the
    #     feature magnitudes by the window's physical extent, not the
    #     cloud's.
    #  2. hi/lo bf16 split of the feature rows IN-KERNEL (XLA folds
    #     f32(bf16(x)) -> x outside), concatenated to (20, C) so the sel
    #     operand streams through the MXU once at default precision; sel
    #     itself is 0/1, exact in bf16.
    pvf = jnp.where(pv, one, zero)
    nv = jnp.maximum(jnp.sum(pvf, axis=1, keepdims=True), one)
    shx = jnp.sum(px * pvf, axis=1, keepdims=True) / nv  # (1, 1)
    shy = jnp.sum(py * pvf, axis=1, keepdims=True) / nv
    shz = jnp.sum(pz * pvf, axis=1, keepdims=True) / nv
    ax = px - shx
    ay = py - shy
    az = pz - shz
    f = jnp.concatenate(
        [jnp.ones_like(ax), ax, ay, az,
         ax * ax, ax * ay, ax * az, ay * ay, ay * az, az * az],
        axis=0,
    )  # (10, C)
    f_hi = f.astype(jnp.bfloat16)
    f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    f20 = jnp.concatenate([f_hi, f_lo], axis=0)  # (20, C)
    s20 = jax.lax.dot_general(
        sel.astype(jnp.bfloat16), f20, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, 20)
    return s20[:, :10] + s20[:, 10:]  # (Q, 10)


def _window_kernel_percloud(
    cx_ref, cy_ref, cz_ref, valid_ref,
    cnt_ref, sx_ref, sy_ref, sz_ref,
    sxx_ref, sxy_ref, sxz_ref, syy_ref, syz_ref, szz_ref,
    *, q_block: int, window: int, k: int,
):
    """One program per CLOUD, python-unrolled over query blocks: a grid
    program per (cloud, block) pays ~4 us of launch overhead each — at
    256 clouds x 8 blocks that overhead (~8 ms) dwarfs the ~2 ms of
    compute. The unrolled loop keeps the cloud's planes VMEM-resident
    across blocks and makes every slice offset a compile-time constant."""
    n = cx_ref.shape[-1]
    c = q_block + 2 * window

    for iq in range(n // q_block):
        q0 = iq * q_block
        start = min(max(q0 - window, 0), n - c)
        sums = _moment_sums_for_block(
            cx_ref, cy_ref, cz_ref, valid_ref, q0, start,
            q_block=q_block, c=c, k=k,
        )
        for j, ref in enumerate(
            (cnt_ref, sx_ref, sy_ref, sz_ref,
             sxx_ref, sxy_ref, sxz_ref, syy_ref, syz_ref, szz_ref)
        ):
            ref[0, 0:1, q0:q0 + q_block] = jnp.swapaxes(sums[:, j:j + 1], 0, 1)


def _window_kernel_perblock(
    cx_ref, cy_ref, cz_ref, valid_ref,
    cnt_ref, sx_ref, sy_ref, sz_ref,
    sxx_ref, sxy_ref, sxz_ref, syy_ref, syz_ref, szz_ref,
    *, q_block: int, window: int, k: int,
):
    """One program per (cloud, query block): at small batch x block counts
    (<= ~512 programs) launch overhead is negligible and the finer grid
    pipelines output DMA better than one monolithic per-cloud program —
    measured ~10% faster at config-2 shape (8 x 8192)."""
    n = cx_ref.shape[-1]
    c = q_block + 2 * window
    iq = pl.program_id(1)
    q0 = pl.multiple_of(iq * q_block, 128)
    # q_block, window, and n are all 128-multiples, so the clamped window
    # start stays aligned — Mosaic can't see that through the clip, hence
    # the explicit hint
    start = pl.multiple_of(jnp.clip(q0 - window, 0, n - c), 128)
    sums = _moment_sums_for_block(
        cx_ref, cy_ref, cz_ref, valid_ref, q0, start,
        q_block=q_block, c=c, k=k,
    )
    for j, ref in enumerate(
        (cnt_ref, sx_ref, sy_ref, sz_ref,
         sxx_ref, sxy_ref, sxz_ref, syy_ref, syz_ref, szz_ref)
    ):
        ref[...] = jnp.swapaxes(sums[:, j:j + 1], 0, 1)[None]


def windowed_moment_sums(
    centered: jnp.ndarray,
    valid_mask: jnp.ndarray,
    k: int,
    window: int = 256,
    q_block: int = 256,
) -> tuple[jnp.ndarray, ...]:
    """Per-point masked neighborhood moment sums over an index window.

    Args:
      centered: (b, n, 3) per-cloud-centered coordinates, ideally in a
        spatially local order (Morton / voxel-sorted). n % 128 == 0.
      valid_mask: (b, n) bool.
      k: target neighborhood size (the threshold search's count goal).
      window: one-sided candidate half-width W (multiple of 128); each
        query sees C = q_block + 2W candidates.
      q_block: queries per program (multiple of 128, divides n).

    Returns 10 (b, n) f32 arrays:
      (cnt, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz).

    CONTRACT: the moment sums are computed in coordinates shifted by an
    arbitrary per-query-block constant (the block's valid-candidate mean)
    — consumers may only form SHIFT-INVARIANT quantities from them, i.e.
    the covariance ``sxx/cnt - (sx/cnt)^2`` etc., never absolute means.
    """
    b, n = centered.shape[:2]
    if n % q_block or q_block % 128 or window % 128:
        raise ValueError(
            f"windowed_moment_sums needs n % q_block == 0 and 128-aligned "
            f"q_block/window; got n={n} q_block={q_block} window={window}"
        )
    c = q_block + 2 * window
    if c > n:
        raise ValueError(
            f"candidate window {c} exceeds cloud size {n}; shrink `window`"
        )
    # unit middle axis: Mosaic wants block sublane dims 8-divisible or equal
    # to the array dim; (b, 1, n) arrays with (1, 1, n) blocks satisfy it
    planes = jnp.moveaxis(centered.astype(jnp.float32), -1, 0)[:, :, None, :]
    validf = valid_mask.astype(jnp.float32)[:, None, :]

    out_shape = jax.ShapeDtypeStruct((b, 1, n), jnp.float32)
    n_blocks = n // q_block
    if b * n_blocks <= 512:
        # fine grid: per-(cloud, block) programs — launch overhead is small
        # at this program count and the finer grid pipelines output DMA
        row_spec = pl.BlockSpec(
            (1, 1, n), lambda ib, iq: (ib, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, 1, q_block), lambda ib, iq: (ib, 0, iq), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(
            _window_kernel_perblock, q_block=q_block, window=window, k=k
        )
        grid = (b, n_blocks)
    else:
        # coarse grid: one program per cloud, blocks python-unrolled —
        # amortizes the ~4 us/program launch cost at large batches
        row_spec = pl.BlockSpec(
            (1, 1, n), lambda ib: (ib, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = row_spec
        kernel = functools.partial(
            _window_kernel_percloud, q_block=q_block, window=window, k=k
        )
        grid = (b,)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec] * 4,
        out_specs=(out_spec,) * 10,
        out_shape=(out_shape,) * 10,
        interpret=_interpret(),
    )(planes[0], planes[1], planes[2], validf)
    return tuple(o[:, 0, :] for o in outs)

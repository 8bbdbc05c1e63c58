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

_INF_BITS = 0x7F800000  # +inf
_VALID_MAX_BITS = 0x7F000000  # 2^127, largest threshold (fallback: all valid)
_CAP_BITS = (127 + 60) << 23  # cap the base at 2^60 so +11 levels can't hit inf


def _moment_sums_for_block_v2(
    cx_ref, cy_ref, cz_ref, valid_ref, q0, start,
    *, q_block: int, c: int, k: int,
):
    """(Q, 10) moment sums — integer-bit threshold search + MXU distances.

    Replaces the v1 float search with two structural changes, both exact:

    - Distances through the MXU: per-block-shifted coordinates are split
      hi/lo in bf16 and contracted as one (Q, 6) @ (6, C) matmul —
      (qh+ql)·(ph+pl) expands to all four partial products inside the f32
      accumulator, so q·p carries ~2^-30 relative error. The VPU sees only
      the 2-op combine d = qn + pn - 2qp instead of the 8-op direct
      (q-p)^2 build. Rounding can leave self-distances at ~|q|^2 2^-24
      instead of exactly 0, so the query column is masked by INDEX and a
      noise floor (extent^2 2^-18) guards the nearest-neighbor base
      against duplicate/noise collapse.
    - The count-threshold search in integer bit space: for nonnegative
      finite f32, the bit pattern orders like the float, and adding
      (s << 23) to a float's bits multiplies it by exactly 2^s. So
      ``d <= m 2^s`` is ONE int32 compare against ``rm + (s << 23)`` —
      no mul, no exp2, no float select per probe. The half-level refine
      subtracts (1 << 22) from the threshold bits (a factor in
      [0.667, 0.833] depending on the mantissa — same role as the v1
      sqrt(1/2) step, count-verified). The v1 explicit top-level
      fallback probe is folded into the final count: if the widest level
      misses k, the threshold opens to every valid candidate, matching
      the brute-force path's kth = inf behavior.
    """
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    px = cx_ref[0, 0:1, pl.ds(start, c)]
    py = cy_ref[0, 0:1, pl.ds(start, c)]
    pz = cz_ref[0, 0:1, pl.ds(start, c)]
    pv = valid_ref[0, 0:1, pl.ds(start, c)] > 0.5

    # per-block shift (valid-candidate mean): bounds feature magnitudes by
    # the window's physical extent AND conditions the expanded-form
    # distances (cancellation error scales with extent^2, not cloud^2)
    pvf = jnp.where(pv, one, zero)
    nv = jnp.maximum(jnp.sum(pvf, axis=1, keepdims=True), one)
    shx = jnp.sum(px * pvf, axis=1, keepdims=True) / nv  # (1, 1)
    shy = jnp.sum(py * pvf, axis=1, keepdims=True) / nv
    shz = jnp.sum(pz * pvf, axis=1, keepdims=True) / nv
    ax = px - shx
    ay = py - shy
    az = pz - shz
    qx = jnp.swapaxes(cx_ref[0, 0:1, pl.ds(q0, q_block)], 0, 1) - shx
    qy = jnp.swapaxes(cy_ref[0, 0:1, pl.ds(q0, q_block)], 0, 1) - shy
    qz = jnp.swapaxes(cz_ref[0, 0:1, pl.ds(q0, q_block)], 0, 1) - shz

    # hi/lo bf16 split -> ONE (Q, 12) @ (12, C) MXU pass carrying all four
    # hi/lo partial products (qh+ql).(ph+pl) in the f32 accumulator:
    # q12 = [qh, qh, ql, ql], p12 = [ph; pl; ph; pl]
    q3 = jnp.concatenate([qx, qy, qz], axis=1)  # (Q, 3)
    p3 = jnp.concatenate([ax, ay, az], axis=0)  # (3, C)
    q_hi = q3.astype(jnp.bfloat16)
    q_lo = (q3 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    p_hi = p3.astype(jnp.bfloat16)
    p_lo = (p3 - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    q12 = jnp.concatenate([q_hi, q_hi, q_lo, q_lo], axis=1)  # (Q, 12)
    p12 = jnp.concatenate([p_hi, p_lo, p_hi, p_lo], axis=0)  # (12, C)
    qp = jax.lax.dot_general(
        q12, p12, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, C) ~= q.p to 2^-30 relative
    qn = jnp.sum(q3 * q3, axis=1, keepdims=True)  # (Q, 1)
    pn = jnp.sum(p3 * p3, axis=0, keepdims=True)  # (1, C)
    d = jnp.maximum(qn + pn - 2.0 * qp, zero)  # (Q, C)

    # integer bit space: nonnegative f32 bit patterns order like the floats
    ri = pltpu.bitcast(d, jnp.int32)
    ri = jnp.where(pv, ri, _INF_BITS)  # invalid -> +inf bits

    # nearest-neighbor base per query, excluding (a) the query itself BY
    # INDEX (expanded-form rounding leaves self-distances at noise, not 0)
    # and (b) anything under the noise floor extent^2 2^-18 (duplicates +
    # MXU noise would collapse the base and defeat the level search)
    ext2 = jnp.maximum(jnp.max(qn), jnp.max(pn))  # block extent^2, scalar
    nf_bits = pltpu.bitcast(
        (ext2 * jnp.float32(2.0 ** -18)).reshape(1, 1), jnp.int32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (q_block, c), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (q_block, c), 0)
    is_self = (col - row) == (q0 - start)
    base = jnp.where(is_self | (ri <= nf_bits), _INF_BITS, ri)
    rm = jnp.min(base, axis=1, keepdims=True)  # (Q, 1) bits of m
    rm = jnp.minimum(rm, _CAP_BITS)

    # smallest level s in [0, _LEVELS) with count(d <= m 2^s) >= k:
    # rm + (s << 23) IS the bit pattern of m * 2^s, so each probe is one
    # int compare + count. Bisection, ceil(log2(_LEVELS)) = 4 probes.
    kcnt = jnp.int32(k)
    lo = jnp.zeros((q_block, 1), jnp.int32)
    hi = jnp.full((q_block, 1), _LEVELS - 1, jnp.int32)
    for _ in range(4):
        mid = (lo + hi) >> 1
        cnt = jnp.sum(
            jnp.where(ri <= rm + (mid << 23), 1, 0),
            axis=1, keepdims=True, dtype=jnp.int32,
        )
        ok = cnt >= kcnt
        hi = jnp.where(ok, mid, hi)
        lo = jnp.where(ok, lo, mid + 1)
    t_full = rm + (hi << 23)
    t_half = t_full - (1 << 22)  # ~0.67-0.83x in value (mantissa-dependent)
    cnt_full = jnp.sum(
        jnp.where(ri <= t_full, 1, 0), axis=1, keepdims=True, dtype=jnp.int32
    )
    cnt_half = jnp.sum(
        jnp.where(ri <= t_half, 1, 0), axis=1, keepdims=True, dtype=jnp.int32
    )
    # widest level short of k -> open to every valid candidate (kth = inf)
    t = jnp.where(
        cnt_full < kcnt,
        _VALID_MAX_BITS,
        jnp.where(cnt_half >= kcnt, t_half, t_full),
    )
    sel = jnp.where(ri <= t, one, zero)  # (Q, C)

    # moment sums: identical MXU engine to v1 (see its precision notes)
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


#: threshold-search implementation: "v1" (float probes — the default;
#: measured 29.9 vs 27.8 Mpts/s against "v2") | "v2" (integer-bit probes +
#: hi/lo-MXU distances — equal quality, measured slightly SLOWER: a stage
#: ablation shows the kernel is reduce/matmul-bound, and v2 only thins the
#: already-cheap elementwise passes while adding iota/int-select masks;
#: kept as a measured negative result + numerical cross-check, see
#: docs/PERF.md)
_SEARCH_IMPL = "v1"


def _block_body():
    return (_moment_sums_for_block_v2 if _SEARCH_IMPL == "v2"
            else _moment_sums_for_block)


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
        sums = _block_body()(
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
    sums = _block_body()(
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
    layout: str = "bnc",
) -> tuple[jnp.ndarray, ...]:
    """Per-point masked neighborhood moment sums over an index window.

    Args:
      centered: (b, n, 3) per-cloud-centered coordinates, ideally in a
        spatially local order (Morton / voxel-sorted). n % 128 == 0.
        With ``layout='bcn'``, plane-major (b, 3, n) — the kernel's native
        orientation (skips the (b, n, 3) transpose copies on entry).
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
    if layout == "bcn":
        b, _, n = centered.shape
    else:
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
    # to the array dim; (b, 1, n) arrays with (1, 1, n) blocks satisfy it.
    # 'bcn' input is already plane-major: the axis moves below are leading-
    # dim permutes (row-granularity relabels), not elementwise transposes
    if layout == "bcn":
        planes = jnp.moveaxis(centered.astype(jnp.float32), 1, 0)[:, :, None, :]
    else:
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

"""VMEM-resident Pallas gather(+max/min) kernel candidates vs the one-hot
MXU gather (round-4, VERDICT item 1).

The DGCNN factored edge block needs, per EdgeConv layer,
``qmax[i,c] = max_j q[idx[i,j], c]`` and the matching min — a k-sparse
selection that the one-hot formulation pays a dense (n)-contraction for:
b*n*k*n*w MACs (~10 ms of the 23 ms b64 step across the four layers).

Candidates measured here (b64, n=1024, k=20, per-layer widths):

- ``onehot``     — baseline: gather_rows (one-hot MXU matmul) + max/min.
- ``lane``       — Pallas, channels-first: qT (w, n) VMEM-resident; per
                   neighbor slot j one ``take_along_axis(qT, idx_j, axis=1)``
                   (Mosaic ``tpu.dynamic_gather`` along lanes) + running
                   max/min. No k-wide tensor, no n-contraction.
- ``sublane``    — Pallas, points-first: q (n, w); gather along sublanes
                   (axis=0 dynamic_gather). Expected slower (cross-sublane
                   shuffles decompose worse than lane shuffles).
- ``rowloop``    — Pallas, per-edge dynamic-slice row reads (the naive
                   "VMEM gather"): documents where serial row reads land.

Run:  python docs/exp/gather_kernel_bench.py [exp ...]   (default: lane onehot)
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

B, N, K = 64, 1024, 20
WIDTHS = (64, 64, 128, 256)
NEG = float(np.finfo(np.float32).min)


def timeit(name, fn, *args, steps=100):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # sync after compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)  # hold only the newest output (FIFO stream)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # ONE sync
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"  {name:48s} {ms:8.3f} ms", flush=True)
    return ms


def _q(w, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, N, w)).astype(np.float32)
    ).astype(jnp.bfloat16)


def _idx(seed=1):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, N, size=(B, N, K)).astype(np.int32)
    )


# ---------------------------------------------------------------- baselines
def onehot_maxmin(q, idx):
    from pointcloudprocessing_tpu.ops.gather import gather_rows_matmul

    g = gather_rows_matmul(q, idx)  # (b, n, k, w)
    return jnp.max(g, axis=2), jnp.min(g, axis=2)


# ------------------------------------------------------------- lane kernel
_LANE_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(1,),
    start_index_map=(1,),
    operand_batching_dims=(0,),
    start_indices_batching_dims=(0,),
)


def gather_lanes(x2d, ids2d):
    """Mosaic tpu.dynamic_gather along lanes: out[s, l] = x2d[s, ids2d[s, l]].

    Calls lax.gather directly: jnp.take_along_axis promotes indices to i32
    (negative-index handling) but the Mosaic op wants index bitwidth ==
    data bitwidth, so 16-bit data needs i16 indices and in-bounds promises.
    """
    itype = jnp.int16 if x2d.dtype.itemsize == 2 else jnp.int32
    return jax.lax.gather(
        x2d,
        ids2d.astype(itype)[..., None],
        _LANE_DN,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _lane_kernel(idx_ref, qT_ref, mx_ref, mn_ref):
    # tpu.dynamic_gather shuffles within ONE vreg of source lanes (128) and
    # requires src/idx/out same-shape, so the n-lane gather decomposes into
    # (output 128-lane tiles) x (source 128-lane chunks) single-vreg
    # gathers + chunk-match selects. Mosaic only lowers LANE gathers for
    # 32-bit types ("8- and 16-bit dynamic gather only supported along 2nd
    # minor dimension"), so bf16 sources upcast to f32 in VMEM first.
    qT = qT_ref[0]  # (w, n)
    w, n = qT.shape
    n_chunks = n // 128
    chunks = [
        qT[:, m * 128:(m + 1) * 128].astype(jnp.float32)
        for m in range(n_chunks)
    ]
    for t in range(n_chunks):  # output lane tiles
        mx = jnp.full((w, 128), NEG, jnp.float32)
        mn = jnp.full((w, 128), -NEG, jnp.float32)
        for j in range(K):
            ids = idx_ref[0, j, t * 128:(t + 1) * 128]  # (128,) int32
            lo = jnp.broadcast_to((ids % 128)[None, :], (w, 128))
            hi = ids // 128
            g = jnp.full((w, 128), NEG, jnp.float32)
            for m in range(n_chunks):
                got = gather_lanes(chunks[m], lo)
                g = jnp.where(
                    jnp.broadcast_to((hi == m)[None, :], (w, 128)), got, g
                )
            mx = jnp.maximum(mx, g)
            mn = jnp.minimum(mn, g)
        mx_ref[0, :, t * 128:(t + 1) * 128] = mx.astype(qT.dtype)
        mn_ref[0, :, t * 128:(t + 1) * 128] = mn.astype(qT.dtype)


def lane_maxmin_T(qT, idxT):
    """qT (b, w, n) bf16, idxT (b, k, n) int32 -> (qmaxT, qminT) (b, w, n)."""
    b, w, n = qT.shape
    return pl.pallas_call(
        _lane_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, K, n), lambda i: (i, 0, 0)),
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
    )(idxT, qT)


def lane_maxmin(q, idx):
    """(b, n, w) layout in/out — includes the transposes the model would pay
    if it stays points-first."""
    qT = jnp.swapaxes(q, 1, 2)
    idxT = jnp.swapaxes(idx, 1, 2)
    mxT, mnT = lane_maxmin_T(qT, idxT)
    return jnp.swapaxes(mxT, 1, 2), jnp.swapaxes(mnT, 1, 2)


# ------------------------------------------------- lane kernel, chunk-skip
def _lane_skip_kernel(idx_ref, qT_ref, mx_ref, mn_ref):
    """_lane_kernel + per-(tile, j, chunk) lax.cond skipping source chunks
    no index in the output tile's slot-j vector touches. On spatially
    ordered input (Morton voxel order) kNN indices are index-local, so most
    chunks skip; on random input every chunk is touched and this reduces to
    _lane_kernel plus predicate overhead."""
    qT = qT_ref[0]  # (w, n)
    w, n = qT.shape
    n_chunks = n // 128
    chunks = [
        qT[:, m * 128:(m + 1) * 128].astype(jnp.float32)
        for m in range(n_chunks)
    ]
    for t in range(n_chunks):
        mx = jnp.full((w, 128), NEG, jnp.float32)
        mn = jnp.full((w, 128), -NEG, jnp.float32)
        for j in range(K):
            ids = idx_ref[0, j, t * 128:(t + 1) * 128]  # (128,) int32
            lo = jnp.broadcast_to((ids % 128)[None, :], (w, 128))
            hi = ids // 128
            g = jnp.full((w, 128), NEG, jnp.float32)
            for m in range(n_chunks):
                hit = jnp.broadcast_to((hi == m)[None, :], (w, 128))

                def take(g=g, m=m, lo=lo, hit=hit):
                    return jnp.where(hit, gather_lanes(chunks[m], lo), g)

                g = jax.lax.cond(jnp.any(hi == m), take, lambda g=g: g)
            mx = jnp.maximum(mx, g)
            mn = jnp.minimum(mn, g)
        mx_ref[0, :, t * 128:(t + 1) * 128] = mx.astype(qT.dtype)
        mn_ref[0, :, t * 128:(t + 1) * 128] = mn.astype(qT.dtype)


def lane_skip_maxmin_T(qT, idxT):
    b, w, n = qT.shape
    return pl.pallas_call(
        _lane_skip_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, K, n), lambda i: (i, 0, 0)),
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
    )(idxT, qT)


def _idx_local(seed=2, span=64):
    """Index-local neighbor ids (the Morton-ordered ec1 regime)."""
    r = np.random.default_rng(seed)
    base = np.arange(N)[None, :, None]
    delta = r.integers(-span, span + 1, size=(B, N, K))
    return jnp.asarray(np.clip(base + delta, 0, N - 1).astype(np.int32))


# ---------------------------------------------------------- sublane kernel
_SUBLANE_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(0,),
    start_index_map=(0,),
    operand_batching_dims=(1,),
    start_indices_batching_dims=(1,),
)


def gather_sublanes(x2d, ids2d):
    """Mosaic tpu.dynamic_gather along sublanes: out[s, l] = x2d[ids2d[s, l], l].

    Direct lax.gather: take_along_axis promotes indices to i32, but the
    Mosaic op requires index bitwidth == data bitwidth (bf16 -> i16).
    """
    itype = jnp.int16 if x2d.dtype.itemsize == 2 else jnp.int32
    return jax.lax.gather(
        x2d,
        ids2d.astype(itype)[..., None],
        _SUBLANE_DN,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _sublane_kernel(idx_ref, q_ref, mx_ref, mn_ref):
    q = q_ref[0]  # (n, w)
    mx = jnp.full(q.shape, NEG, q.dtype)
    mn = jnp.full(q.shape, -NEG, q.dtype)
    for j in range(K):
        ids = jnp.broadcast_to(idx_ref[0, :, j][:, None], q.shape)
        g = gather_sublanes(q, ids)
        mx = jnp.maximum(mx, g)
        mn = jnp.minimum(mn, g)
    mx_ref[0] = mx
    mn_ref[0] = mn


def sublane_maxmin(q, idx):
    b, n, w = q.shape
    return pl.pallas_call(
        _sublane_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, w), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, w), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, w), q.dtype),
            jax.ShapeDtypeStruct((b, n, w), q.dtype),
        ],
    )(idx, q)


# ---------------------------------------------------------- row-loop kernel
def _rowloop_kernel(idx_ref, q_ref, mx_ref, mn_ref):
    q = q_ref[0]  # (n, w)
    w = q.shape[1]

    def point(i, _):
        mx = jnp.full((1, w), NEG, q.dtype)
        mn = jnp.full((1, w), -NEG, q.dtype)
        for j in range(K):
            r = jax.lax.dynamic_slice(q, (idx_ref[0, i, j], 0), (1, w))
            mx = jnp.maximum(mx, r)
            mn = jnp.minimum(mn, r)
        mx_ref[0, pl.ds(i, 1), :] = mx
        mn_ref[0, pl.ds(i, 1), :] = mn
        return ()

    jax.lax.fori_loop(0, q.shape[0], point, ())


def rowloop_maxmin(q, idx):
    b, n, w = q.shape
    return pl.pallas_call(
        _rowloop_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n, K), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, n, w), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, w), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, w), q.dtype),
            jax.ShapeDtypeStruct((b, n, w), q.dtype),
        ],
    )(idx, q)


# ----------------------------------------------------------------- checks
def check(name, got, want):
    g = np.asarray(got[0], np.float32), np.asarray(got[1], np.float32)
    w_ = np.asarray(want[0], np.float32), np.asarray(want[1], np.float32)
    err = max(np.max(np.abs(g[0] - w_[0])), np.max(np.abs(g[1] - w_[1])))
    print(f"  {name:48s} max|d| vs native = {err:g}", flush=True)


def native_maxmin(q, idx):
    g = jnp.take_along_axis(
        q.astype(jnp.float32), idx.reshape(B, -1)[..., None], axis=1
    ).reshape(B, N, K, q.shape[-1])
    return jnp.max(g, axis=2), jnp.min(g, axis=2)


def exp_onehot():
    print(f"[onehot] baseline gather+max/min (b{B}, n={N}, k={K})")
    idx = _idx()
    for w in WIDTHS:
        timeit(f"onehot w={w}", jax.jit(onehot_maxmin), _q(w), idx)


def exp_lane():
    print(f"[lane] channels-first dynamic_gather kernel (b{B}, n={N}, k={K})")
    idx = _idx()
    idxT = jnp.swapaxes(idx, 1, 2)
    for w in WIDTHS:
        q = _q(w)
        qT = jnp.swapaxes(q, 1, 2)
        got = jax.jit(lane_maxmin_T)(qT, idxT)
        want = jax.jit(native_maxmin)(q, idx)
        check(f"lane_T w={w}", (jnp.swapaxes(got[0], 1, 2),
                                jnp.swapaxes(got[1], 1, 2)), want)
        timeit(f"lane_T w={w} (channels-first in/out)",
               jax.jit(lane_maxmin_T), qT, idxT)
        timeit(f"lane w={w} (with layout transposes)",
               jax.jit(lane_maxmin), q, idx)


def exp_sublane():
    print(f"[sublane] points-first dynamic_gather kernel (b{B}, n={N}, k={K})")
    idx = _idx()
    for w in WIDTHS:
        q = _q(w)
        got = jax.jit(sublane_maxmin)(q, idx)
        check(f"sublane w={w}", got, jax.jit(native_maxmin)(q, idx))
        timeit(f"sublane w={w}", jax.jit(sublane_maxmin), q, idx)


def exp_rowloop():
    print(f"[rowloop] per-edge dynamic-slice kernel (b{B}, n={N}, k={K})")
    idx = _idx()
    for w in (256,):
        q = _q(w)
        got = jax.jit(rowloop_maxmin)(q, idx)
        check(f"rowloop w={w}", got, jax.jit(native_maxmin)(q, idx))
        timeit(f"rowloop w={w}", jax.jit(rowloop_maxmin), q, idx)


def exp_lane_skip():
    print(f"[lane_skip] chunk-skipping lane kernel (b{B}, n={N}, k={K})")
    for label, idx in (("random", _idx()), ("local+-64", _idx_local())):
        idxT = jnp.swapaxes(idx, 1, 2)
        for w in (64, 256):
            q = _q(w)
            qT = jnp.swapaxes(q, 1, 2)
            got = jax.jit(lane_skip_maxmin_T)(qT, idxT)
            want = jax.jit(native_maxmin)(q, idx)
            check(f"lane_skip w={w} {label}",
                  (jnp.swapaxes(got[0], 1, 2), jnp.swapaxes(got[1], 1, 2)),
                  want)
            timeit(f"lane_skip w={w} {label}",
                   jax.jit(lane_skip_maxmin_T), qT, idxT)


EXPS = {
    "onehot": exp_onehot,
    "lane": exp_lane,
    "lane_skip": exp_lane_skip,
    "sublane": exp_sublane,
    "rowloop": exp_rowloop,
}

if __name__ == "__main__":
    import traceback

    names = sys.argv[1:] or ["lane", "onehot"]
    print(f"backend: {jax.default_backend()}", flush=True)
    for nm in names:
        try:
            EXPS[nm]()
        except Exception:
            traceback.print_exc()
            print(f"[{nm}] FAILED", flush=True)

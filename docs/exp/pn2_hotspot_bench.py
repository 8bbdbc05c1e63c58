"""PointNet++ hotspot experiments (trace: docs/PERF.md round 3).

The b256/1024pt PN++ step measures 184 ms: row gathers for grouping
(fusion.3/.2/.4 — 47+24+17 ms), kNN via approx_min_k lowering to a FULL
SORT (23 ms), and interpolate's exact top_k full sort (23 ms). Each
experiment isolates one hotspot at the real shape and races candidate
formulations.

Run:  python docs/exp/pn2_hotspot_bench.py [exp ...]   (default: all)
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

B, N, M, K = 256, 1024, 512, 32


def timeit(name, fn, *args, steps=30):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # sync after compile
    t0 = time.perf_counter()
    for _ in range(steps):
        # hold ONLY the newest output: queued steps are independent and big
        # (a (256,512,32,64) f32 output is 4.3 GB — holding 30 would OOM
        # the 16 GB HBM); freeing dispatched buffers as we go keeps the
        # FIFO pipelining while the LAST read still proves all ran
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # ONE sync, FIFO
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"  {name:42s} {ms:8.2f} ms", flush=True)
    return ms


def exp_knn():
    """SA kNN (B, M queries, N points, k=32): vmapped approx_min_k (the
    current formulation — trace shows a full-sort lowering) vs rank-2
    reshape, vs plain top_k."""
    print("[knn] queries (256, 512, 3) over (256, 1024, 3), k=32")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    def dists(q, p):
        q2 = jnp.sum(q * q, -1, keepdims=True)
        p2 = jnp.sum(p * p, -1)
        cross = jnp.einsum(
            "bmc,bnc->bmn", q, p, precision=jax.lax.Precision.HIGHEST
        )
        return q2 + p2[:, None, :] - 2.0 * cross

    @jax.jit
    def vmapped_approx(q, p):
        def one(qq, pp):
            d = dists(qq[None], pp[None])[0]
            return jax.lax.approx_min_k(d, K)
        return jax.vmap(one)(q, p)

    @jax.jit
    def batched_approx(q, p):
        d = dists(q, p)  # (B, M, N) — approx_min_k on the batched rank-3
        return jax.lax.approx_min_k(d, K)

    @jax.jit
    def rank2_approx(q, p):
        d = dists(q, p).reshape(B * M, N)
        v, i = jax.lax.approx_min_k(d, K)
        return v.reshape(B, M, K), i.reshape(B, M, K)

    @jax.jit
    def exact_topk(q, p):
        d = dists(q, p)
        nv, i = jax.lax.top_k(-d, K)
        return -nv, i

    timeit("vmapped approx_min_k (current)", vmapped_approx, q, p)
    timeit("batched rank-3 approx_min_k", batched_approx, q, p)
    timeit("rank-2 reshape approx_min_k", rank2_approx, q, p)
    timeit("exact top_k", exact_topk, q, p)


def exp_3nn():
    """interpolate_features' 3-NN (fine N=1024 over coarse M=512): exact
    top_k full sort (current) vs 3 iterative masked argmins."""
    print("[3nn] fine (256, 1024) over coarse (256, 512), k=3")
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))

    def dists(q, p):
        q2 = jnp.sum(q * q, -1, keepdims=True)
        p2 = jnp.sum(p * p, -1)
        cross = jnp.einsum(
            "bmc,bnc->bmn", q, p, precision=jax.lax.Precision.HIGHEST
        )
        return q2 + p2[:, None, :] - 2.0 * cross

    @jax.jit
    def topk3(f, c):
        d = dists(f, c)
        nv, i = jax.lax.top_k(-d, 3)
        return -nv, i

    @jax.jit
    def argmin3(f, c):
        d = dists(f, c)
        idxs, vals = [], []
        for _ in range(3):
            i = jnp.argmin(d, axis=-1)
            v = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
            idxs.append(i)
            vals.append(v)
            d = jnp.where(
                jax.nn.one_hot(i, d.shape[-1], dtype=bool), jnp.inf, d
            )
        return jnp.stack(vals, -1), jnp.stack(idxs, -1).astype(jnp.int32)

    a = topk3(f, c)
    b = argmin3(f, c)
    same = bool(jnp.all(a[1] == b[1]))
    print(f"  (indices agree: {same})")
    timeit("top_k k=3 (current)", topk3, f, c)
    timeit("3x iterative argmin", argmin3, f, c)


def exp_gather():
    """Group gather (B clouds, M*K=16384 indices into (N, C)): flat
    take_along_axis (current) vs take-gather vs one-hot matmul."""
    for C in (3, 64, 128):
        print(f"[gather] (256, {N}, {C}) rows by (256, {M}, {K}) indices")
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, (B, M, K)).astype(np.int32))

        @jax.jit
        def flat_take_along(x, idx):
            flat = jnp.take_along_axis(
                x, idx.reshape(B, M * K)[..., None], axis=1
            )
            return flat.reshape(B, M, K, C)

        @jax.jit
        def vmap_index(x, idx):
            return jax.vmap(lambda xx, ii: xx[ii])(x, idx)

        @jax.jit
        def onehot_matmul(x, idx):
            oh = jax.nn.one_hot(
                idx.reshape(B, M * K), N, dtype=jnp.bfloat16
            )
            out = jnp.einsum(
                "bgn,bnc->bgc", oh, x.astype(jnp.bfloat16)
            )
            return out.reshape(B, M, K, C)

        @jax.jit
        def sorted_take(x, idx):
            flat = idx.reshape(B, M * K)
            order = jnp.argsort(flat, axis=-1)
            inv = jnp.argsort(order, axis=-1)
            sorted_idx = jnp.take_along_axis(flat, order, axis=-1)
            rows = jnp.take_along_axis(
                x, sorted_idx[..., None], axis=1
            )
            back = jnp.take_along_axis(rows, inv[..., None], axis=1)
            return back.reshape(B, M, K, C)

        timeit("flat take_along_axis (current)", flat_take_along, x, idx)
        timeit("vmap x[idx]", vmap_index, x, idx)
        timeit("one-hot bf16 matmul", onehot_matmul, x, idx)
        timeit("sort+take+unsort", sorted_take, x, idx)


def exp_ballquery():
    """Sort-free ball query (first K in-radius points, canonical PN++
    grouping) vs the kNN formulations. slot = cumsum of the radius mask;
    the index scatter runs as two one-hot bf16 matmuls (hi/lo byte split —
    bf16 holds integers exactly only up to 256)."""
    print("[ballquery] (256, 512) queries over (256, 1024), K=32, r=0.4")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    R = 0.4

    def dists(q, p):
        q2 = jnp.sum(q * q, -1, keepdims=True)
        p2 = jnp.sum(p * p, -1)
        cross = jnp.einsum(
            "bmc,bnc->bmn", q, p, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.maximum(q2 + p2[:, None, :] - 2.0 * cross, 0.0)

    @jax.jit
    def ball_scatter(q, p):
        d = dists(q, p)  # (B, M, N)
        within = d <= R * R
        rank = jnp.cumsum(within.astype(jnp.int32), axis=-1)
        slot = jnp.where(within, rank - 1, K)  # K = overflow bin
        oh = jax.nn.one_hot(slot, K + 1, dtype=jnp.bfloat16)  # (B,M,N,K+1)
        n_idx = jnp.arange(N, dtype=jnp.int32)
        hi = (n_idx // 256).astype(jnp.bfloat16)
        lo = (n_idx % 256).astype(jnp.bfloat16)
        got_hi = jnp.einsum("bmns,n->bms", oh, hi)
        got_lo = jnp.einsum("bmns,n->bms", oh, lo)
        idx = (
            got_hi.astype(jnp.int32) * 256 + got_lo.astype(jnp.int32)
        )[..., :K]
        filled = jnp.einsum("bmns,n->bms", oh, jnp.ones((N,), jnp.bfloat16))
        idx = jnp.where(filled[..., :K] > 0, idx, idx[..., :1])
        return idx

    @jax.jit
    def ball_argsort(q, p):
        d = dists(q, p)
        within = d <= R * R
        order = jnp.argsort(~within, axis=-1, stable=True)[..., :K]
        first = order[..., :1]
        got = jnp.take_along_axis(within, order, axis=-1)
        return jnp.where(got, order, first).astype(jnp.int32)

    a = ball_scatter(q, p)
    b = ball_argsort(q, p)
    print(f"  (formulations agree: {bool(jnp.all(a == b))})")
    timeit("ball query via cumsum+onehot scatter", ball_scatter, q, p)
    timeit("ball query via stable argsort", ball_argsort, q, p)


def exp_approx_variants():
    print("[approx] (256, 512, 1024) k=32 approx_min_k variants")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    def dists(q, p):
        q2 = jnp.sum(q * q, -1, keepdims=True)
        p2 = jnp.sum(p * p, -1)
        cross = jnp.einsum(
            "bmc,bnc->bmn", q, p, precision=jax.lax.Precision.HIGHEST
        )
        return q2 + p2[:, None, :] - 2.0 * cross

    for recall, agg in ((0.95, True), (0.85, True), (0.95, False)):
        @jax.jit
        def f(q, p, recall=recall, agg=agg):
            return jax.lax.approx_min_k(
                dists(q, p), K, recall_target=recall, aggregate_to_topk=agg
            )
        try:
            timeit(f"approx recall={recall} aggregate={agg}", f, q, p)
        except Exception as e:
            print(f"  approx recall={recall} aggregate={agg} failed: {e}")


if __name__ == "__main__":
    todo = sys.argv[1:] or ["knn", "3nn", "gather", "ballquery", "approx"]
    for name in todo:
        {"knn": exp_knn, "3nn": exp_3nn, "gather": exp_gather,
         "ballquery": exp_ballquery, "approx": exp_approx_variants}[name]()

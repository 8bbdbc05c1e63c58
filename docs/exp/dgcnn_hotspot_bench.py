"""DGCNN hotspot experiments (family baseline: 2,682 clouds/s b64/1024pt
bf16 = 23.9 ms/step at first TPU measurement).

MEASURED (v5e, see docs/PERF.md "DGCNN hotspots"): the floor estimate
below was wrong — the four PartialReduce kNN calls are ~8 ms (1.7-3.0 ms
each; the distance matmul is negligible and bf16 distances buy nothing
over HIGHEST) and the one-hot gathers ~10 ms (b*n*k*n*width dense
contraction per k-sparse selection). The factored U/V edge block won
(ec4 8.66 -> 7.73 ms; full model 24.8 -> 23.1 ms) and ships as the TPU
default; exact top_k (20 ms/layer) must never be used at model shapes.

Run:  python docs/exp/dgcnn_hotspot_bench.py [exp ...]   (default: all)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

B, N, K = 64, 1024, 20
WIDTHS = (64, 64, 128, 256)


def timeit(name, fn, *args, steps=30):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # sync after compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)  # hold only the newest output (FIFO stream)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # ONE sync
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"  {name:48s} {ms:8.2f} ms", flush=True)
    return ms


def _feats(c, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, N, c)).astype(np.float32)
    ).astype(jnp.bfloat16)


def exp_knn():
    """Per-layer kNN graph cost at each feature width."""
    from pointcloudprocessing_tpu.models.dgcnn import knn_graph

    print("[knn] graph build per feature width (b64, n=1024, k=20)")
    for c in (3,) + WIDTHS[:-1]:
        x = _feats(c)
        timeit(f"approx r0.85 c={c}", jax.jit(lambda x: knn_graph(x, K)), x)
        timeit(f"exact top_k  c={c}",
               jax.jit(lambda x: knn_graph(x, K, exact=True)), x)
    # default-precision distances (bf16 single pass) — neighbor order only
    def knn_bf16(x):
        f = x
        sq = jnp.sum(jnp.square(f.astype(jnp.float32)), axis=-1)
        cross = jnp.einsum("bnc,bmc->bnm", f, f)
        d = sq[:, :, None] + sq[:, None, :] - 2.0 * cross.astype(jnp.float32)
        _, idx = jax.lax.approx_min_k(d, K, recall_target=0.85)
        return idx
    for c in (64, 128):
        timeit(f"approx bf16-dist c={c}", jax.jit(knn_bf16), _feats(c))


def exp_edge():
    """Edge block formulations at the c=128 -> w=256 (ec4) shape."""
    from pointcloudprocessing_tpu.models.dgcnn import knn_graph
    from pointcloudprocessing_tpu.ops.gather import gather_rows

    c, w = 128, 256
    x = _feats(c)
    idx = jax.jit(lambda x: knn_graph(x, K))(x)
    kern = jnp.asarray(
        np.random.default_rng(1).normal(size=(2 * c, w)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def edge_then_mlp(x, idx, kern):
        nbr = gather_rows(x, idx)
        center = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
        e = jnp.concatenate([center, nbr - center], axis=-1)
        h = jax.nn.relu(jnp.einsum("bnkc,cw->bnkw", e, kern))
        return jnp.max(h, axis=2)

    def factored(x, idx, kern):
        # W [x_i ++ (x_j - x_i)] = (U - V) x_i + V x_j
        u, v = kern[:c], kern[c:]
        p = jnp.einsum("bnc,cw->bnw", x, u - v)
        q = jnp.einsum("bnc,cw->bnw", x, v)
        h = jax.nn.relu(p[:, :, None, :] + gather_rows(q, idx))
        return jnp.max(h, axis=2)

    def factored_collapsed(x, idx, kern):
        # relu is monotone: max_j relu(p + q_j) = relu(p + max_j q_j)
        u, v = kern[:c], kern[c:]
        p = jnp.einsum("bnc,cw->bnw", x, u - v)
        q = jnp.einsum("bnc,cw->bnw", x, v)
        qmax = jnp.max(gather_rows(q, idx), axis=2)
        return jax.nn.relu(p + qmax)

    print(f"[edge] ec4 block (c={c} -> w={w}), no BN")
    timeit("gather+concat+matmul (current)", jax.jit(edge_then_mlp), x, idx, kern)
    timeit("factored U/V (gather post-matmul)", jax.jit(factored), x, idx, kern)
    timeit("factored + relu-max collapse", jax.jit(factored_collapsed), x, idx, kern)


def exp_model():
    """Full model + per-piece budget."""
    from pointcloudprocessing_tpu.models.dgcnn import dgcnn_for_width

    model = dgcnn_for_width(23, 12, N, dtype=jnp.bfloat16)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, N, 3)).astype(np.float32)
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), pts[:1]
    )
    print("[model] full multi-head forward (b64)")
    timeit("full fwd", jax.jit(
        lambda v, x: model.apply(v, x, train=False)), variables, pts)
    timeit("cls-only fwd", jax.jit(
        lambda v, x: model.apply(v, x, train=False,
                                 heads=("classification_output",))),
        variables, pts)


EXPS = {"knn": exp_knn, "edge": exp_edge, "model": exp_model}

if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPS)
    for name in names:
        EXPS[name]()

"""Microbench: voxel-sort variants on the real chip.

Question: does the variadic lax.sort cost scale with operand count, and
what would a keys+iota sort buy at the two hot shapes (preprocess
config 2: 8x8192, e2e: 256x2048)?

Timing: the axon tunnel costs ~25-30 ms per host sync, so each variant
chains ITERS sorts inside ONE jitted fori_loop (with a data tie to defeat
CSE) and divides by ITERS; the rtt of an empty chained program is
subtracted.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessing_tpu.ops.morton import morton_keys_3d

ITERS = 50


def timeit(make_step, args, reps=7):
    """make_step(i, args) -> args' with a data dependency; returns ms/iter."""

    @jax.jit
    def chained(args):
        return jax.lax.fori_loop(0, ITERS, make_step, args)

    y = chained(args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = chained(args)
        _ = float(jax.tree.leaves(y)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3 / ITERS


def make(b, n):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (b, n, 3)).astype(np.float32)
    coords = np.floor(pts / 0.5).astype(np.int32)
    rel = jnp.asarray(coords - coords.min(axis=1, keepdims=True))
    hi, lo = morton_keys_3d(rel[..., 0], rel[..., 1], rel[..., 2])
    return jnp.asarray(pts), hi, lo


for b, n in ((8, 8192), (256, 2048)):
    pts, hi, lo = make(b, n)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))

    def tie(i, k):
        # rotate the key by the loop index so each iteration's sort differs
        return (k + i) ^ (k >> 16)

    def step6(i, args):
        hi, lo, x, y, z, v = args
        out = jax.lax.sort((tie(i, hi), lo, x, y, z, v),
                           dimension=-1, is_stable=True, num_keys=2)
        return out

    def step3(i, args):
        hi, lo, x, y, z, v = args
        s_hi, s_lo, s_v = jax.lax.sort(
            (tie(i, hi), lo, v), dimension=-1, is_stable=True, num_keys=2)
        return s_hi, s_lo, x, y, z, s_v

    def step2p(i, args):
        hi, lo, x, y, z, v = args
        s_lo, s_v = jax.lax.sort(
            (tie(i, lo), v), dimension=-1, is_stable=True, num_keys=1)
        return hi, s_lo, x, y, z, s_v

    def step1(i, args):
        hi, lo, x, y, z, v = args
        (s_lo,) = jax.lax.sort((tie(i, lo),), dimension=-1, is_stable=True,
                               num_keys=1)
        return hi, s_lo, x, y, z, v

    args = (hi, lo, x, y, z, iota)
    print(f"shape ({b}, {n}):", flush=True)
    for name, fn in (
        ("sort6(2key+4payload)", step6),
        ("sort3(2key+iota)", step3),
        ("sort2(1key+iota)", step2p),
        ("sort1(1key only)", step1),
    ):
        print(f"  {name:26s} {timeit(fn, args):8.3f} ms/sort", flush=True)

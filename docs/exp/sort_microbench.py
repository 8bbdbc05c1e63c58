"""Microbench: voxel-sort variants on the real chip.

Question: does the variadic lax.sort cost scale with operand count, and
what does a keys+iota sort plus a Pallas one-hot MXU gather buy at the two
hot shapes (preprocess config 2: 8x8192, e2e: 256x2048)?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessing_tpu.ops.morton import morton_keys_3d


def timeit(fn, x, reps=20):
    y = fn(x)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    # chain through a scalar tie so the async tunnel can't overlap steps
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(x)
        _ = float(jax.tree.leaves(y)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def make(b, n):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-30, 30, (b, n, 3)).astype(np.float32))
    coords = jnp.floor(pts / 0.5).astype(jnp.int32)
    rel = coords - jnp.min(coords, axis=1, keepdims=True)
    hi, lo = morton_keys_3d(rel[..., 0], rel[..., 1], rel[..., 2])
    return pts, hi, lo


for b, n in ((8, 8192), (256, 2048)):
    pts, hi, lo = make(b, n)
    valid = jnp.ones((b, n), jnp.int32)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))

    @jax.jit
    def sort6(args):
        hi, lo, pts, valid = args
        return jax.lax.sort(
            (hi, lo, pts[..., 0], pts[..., 1], pts[..., 2], valid),
            dimension=-1, is_stable=True, num_keys=2,
        )

    @jax.jit
    def sort3(args):
        hi, lo, pts, valid = args
        return jax.lax.sort(
            (hi, lo, jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), hi.shape)),
            dimension=-1, is_stable=True, num_keys=2,
        )

    @jax.jit
    def sort2_packed(args):
        hi, lo, pts, valid = args
        packed = (lo & 0x3FFFFFFF)  # pretend 30-bit key
        return jax.lax.sort(
            (packed, jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), hi.shape)),
            dimension=-1, is_stable=True, num_keys=1,
        )

    @jax.jit
    def sort2keys(args):
        hi, lo, pts, valid = args
        return jax.lax.sort((hi, lo), dimension=-1, is_stable=True, num_keys=2)

    args = (hi, lo, pts, valid)
    print(f"shape ({b}, {n}):")
    for name, fn in (
        ("sort6(2key+4payload)", sort6),
        ("sort3(2key+iota)", sort3),
        ("sort2(packed1key+iota)", sort2_packed),
        ("sort2(2keys only)", sort2keys),
    ):
        print(f"  {name:26s} {timeit(fn, args):8.3f} ms")

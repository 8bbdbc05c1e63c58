"""Per-custom-call serialization cost of Mosaic kernels (round-5 VERDICT
item 5: attack the 1.415 ms b32 train-step wall with a concrete mechanism).

Round 3 attributed the residual ~0.17 ms/step of in-loop gaps to "the
serialization around the six Mosaic custom calls per step" (three pooled
chains x fwd+bwd; docs/PERF.md "Scan unroll") after the loop-boundary and
LR-schedule hypotheses were measured dead. This microbench puts a NUMBER on
that attribution: scan bodies with M = 1/2/4/8 serially-dependent trivial
Pallas kernels vs the same dataflow as jnp adds; the slope difference in
per-iteration time is the per-call overhead (semaphore handoff + the
scheduling barrier XLA cannot pipeline across).

If the per-call cost lands near ~28 us, 6 calls explain the whole gap and
the wall is structural (merging the three chains is shape-impossible: they
pool different widths at different ranks). If it lands near ~5 us, the
attribution is wrong and the gap needs a fresh trace.

Usage:  python docs/exp/mosaic_call_overhead.py
Results recorded in docs/PERF.md.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

SHAPE = (8, 128, 128)  # small enough that kernel compute is negligible
LENGTH = 200  # scan iterations per dispatch
REPS = 5


def _kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


@functools.partial(jax.jit, static_argnums=(1, 2))
def chain(x, m, use_pallas):
    call = pl.pallas_call(
        _kernel, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)
    )

    def body(carry, _):
        y = carry
        for _ in range(m):
            y = call(y) if use_pallas else y + 1.0
        # keep the jnp variant from collapsing into one fused add-M
        return y * (1.0 - 1e-20), ()

    y, _ = jax.lax.scan(body, x, None, length=LENGTH)
    return y


def timed(x, m, use_pallas):
    f = lambda v: chain(v, m, use_pallas)
    _ = float(f(x).ravel()[0])  # compile + sync
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = float(f(x).ravel()[0])
        best.append(time.perf_counter() - t0)
    return float(np.median(best)) / LENGTH * 1e6  # us per scan iteration


def main():
    x = jnp.zeros(SHAPE, jnp.float32)
    rows = {}
    for use_pallas in (False, True):
        name = "pallas" if use_pallas else "jnp"
        for m in (1, 2, 4, 8):
            us = timed(x, m, use_pallas)
            rows[(name, m)] = us
            print(f"[{name}] M={m}: {us:8.2f} us/iter", flush=True)
    # least-squares slope of us vs M
    for name in ("jnp", "pallas"):
        ms = np.array([1, 2, 4, 8], dtype=np.float64)
        ys = np.array([rows[(name, m)] for m in (1, 2, 4, 8)])
        slope = np.polyfit(ms, ys, 1)[0]
        print(f"{name} slope: {slope:.2f} us per call")


if __name__ == "__main__":
    main()

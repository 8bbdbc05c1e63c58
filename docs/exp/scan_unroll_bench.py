"""Does `lax.scan(unroll=U)` close the scanned-train-step loop gap?

Round-3 state: the b32/1024pt bf16 multi-step train scan runs at a
measured 1.415 ms/step wall vs 1.24 ms of sync compute — ~0.17 ms/step of
in-loop scheduling gaps (TODO.md, docs/PERF.md "Pallas pooled-chain").
Hypothesis: while-loop iteration boundaries are synchronization points;
unrolling the scan body lets the XLA scheduler overlap iteration k+1's
param-independent work (jitter RNG, target prep, metric math) with
iteration k's tail, and removes per-iteration loop overhead.

Run:  python docs/exp/scan_unroll_bench.py [chunk] [batch]
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

from pointcloudprocessing_tpu.core.config import LearningConfig
from pointcloudprocessing_tpu.models.pointnet import FreezeFlags, PointNet
from pointcloudprocessing_tpu.train import steps as steps_lib

NUM_CLASSES, NUM_PARTS = 23, 12


def build(chunk, batch, width, unroll):
    model = PointNet(
        num_classes=NUM_CLASSES, num_parts=NUM_PARTS,
        regularize_input_transform=True, regularize_feature_transform=True,
        dtype=jnp.bfloat16,
    )
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), width, LearningConfig(rate=1e-4), freeze,
        batch_size=1,
    )
    # the PRODUCTION multi-step builder — this bench measures the exact
    # program the trainer dispatches, not a re-implementation
    fn = steps_lib.make_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.01, 0.01, 0.01),
        unroll=unroll,
    )

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(chunk, batch, width, 3)).astype(np.float32))
    targets = {
        "classification_output": jnp.asarray(
            rng.integers(0, NUM_CLASSES, (chunk, batch)).astype(np.int32)),
        "segmentation_output": jnp.asarray(
            rng.integers(0, NUM_PARTS, (chunk, batch, width)).astype(np.int32)),
        "se3": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (chunk, batch, 3, 3)).copy()),
    }
    return fn, state, xs, targets


def measure(chunk, batch, width, unroll, rounds=8):
    fn, state, xs, targets = build(chunk, batch, width, unroll)
    key = jax.random.key(1)
    t0 = time.perf_counter()
    state, logs = fn(state, xs, targets, key)
    _ = float(logs["loss"][-1])
    compile_s = time.perf_counter() - t0
    per_step = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(rounds):
            state, logs = fn(state, xs, targets, key)
        _ = float(logs["loss"][-1])  # param-dependent -> syncs the chain
        per_step.append((time.perf_counter() - t0) / (rounds * chunk))
    ms = float(np.median(per_step)) * 1e3
    print(
        f"unroll={unroll:2d} chunk={chunk} batch={batch}: "
        f"{ms:.3f} ms/step  {batch / (ms / 1e3):,.0f} clouds/s  "
        f"(compile {compile_s:.0f} s, loss {float(logs['loss'][-1]):.3f})",
        flush=True,
    )
    return ms


if __name__ == "__main__":
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    for unroll in (1, 2, 4):
        measure(chunk, batch, 1024, unroll)

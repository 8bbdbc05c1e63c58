"""Is the exp-decay LR pow re-evaluated inside every fused Adam update?

The round-3 train trace (tools/trace_ops.py train) shows per-param
multiply_add fusions costing far above their byte floor — e.g. 50.9 us
for the three f32[512,256] Adam outputs vs 7.3 us for a f32[256,4096]
(8x the bytes). Hypothesis: `optax.exponential_decay`'s scalar
`rate ** (count / steps)` is broadcast INTO each per-param update fusion
and the TPU fusion emitter re-evaluates the pow per element; with ~150
param leaves the duplicated transcendental work lands on the VPU in
every fusion.

Variants measured on the production make_train_multi_step program
(chunk 32, b32, 1024 pt, bf16 — the bench train shape):
  baseline  — optax.exponential_decay as shipped
  barrier   — same schedule wrapped in lax.optimization_barrier (the
              scalar becomes a fusion boundary: computed once/step)
  const     — constant lr (lower bound: no schedule at all)

Run:  python docs/exp/schedule_barrier_bench.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pointcloudprocessing_tpu.models.pointnet import FreezeFlags, PointNet
from pointcloudprocessing_tpu.train import steps as steps_lib

NUM_CLASSES, NUM_PARTS = 23, 12
CHUNK, BATCH, WIDTH = 32, 32, 1024


def make_opt(variant):
    schedule = optax.exponential_decay(
        init_value=1e-4, transition_steps=7000, decay_rate=0.7, staircase=False
    )
    if variant == "baseline":
        sched = schedule
    elif variant == "barrier":
        def sched(count):
            return jax.lax.optimization_barrier(schedule(count))
    elif variant == "const":
        sched = 1e-4
    else:
        raise ValueError(variant)
    return optax.adam(sched, eps=1e-7)


def build(variant):
    model = PointNet(
        num_classes=NUM_CLASSES, num_parts=NUM_PARTS,
        regularize_input_transform=True, regularize_feature_transform=True,
        dtype=jnp.bfloat16,
    )
    freeze = FreezeFlags()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, WIDTH, 3), jnp.float32), train=False
    )
    params = variables["params"]
    optimizer = make_opt(variant)
    state = steps_lib.TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
    )
    fn = steps_lib.make_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.01, 0.01, 0.01)
    )
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(CHUNK, BATCH, WIDTH, 3)).astype(np.float32))
    targets = {
        "classification_output": jnp.asarray(
            rng.integers(0, NUM_CLASSES, (CHUNK, BATCH)).astype(np.int32)),
        "segmentation_output": jnp.asarray(
            rng.integers(0, NUM_PARTS, (CHUNK, BATCH, WIDTH)).astype(np.int32)),
        "se3": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (CHUNK, BATCH, 3, 3)).copy()),
    }
    return fn, state, xs, targets


def measure(variant, rounds=8):
    fn, state, xs, targets = build(variant)
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
        per_step.append((time.perf_counter() - t0) / (rounds * CHUNK))
    ms = float(np.median(per_step)) * 1e3
    print(
        f"{variant:9s}: {ms:.3f} ms/step  {BATCH / (ms / 1e3):,.0f} clouds/s  "
        f"(compile {compile_s:.0f} s, loss {float(logs['loss'][-1]):.3f})",
        flush=True,
    )
    return ms


if __name__ == "__main__":
    for variant in sys.argv[1:] or ("baseline", "barrier", "const"):
        measure(variant)

"""Benchmark: PointNet inference throughput on one chip.

Headline metric (BASELINE.json): 1024-pt clouds/sec/chip for the flagship
multi-head PointNet (23 classes / 12 parts, both T-Nets — the kc46/f15
model). Prints ONE JSON line; vs_baseline is relative to the 10k
clouds/s/chip north-star target (the reference's GPU training loop ran ~97
clouds/s, BASELINE.md).

Methodology notes:
- The axon TPU tunnel dispatches asynchronously and ``block_until_ready``
  does not wait for remote execution, so each step's output is folded back
  into the next step's input (scaled by 1e-24 — numerically a no-op, but not
  algebraically removable, so XLA cannot DCE the model). A single host read
  syncs the chain; outputs stay device-resident as in a real serving loop.
- Primary number uses JAX's default TPU matmul precision (bf16 passes on the
  MXU — the standard jit path). The exact-f32 mode
  (``jax.default_matmul_precision('highest')``) is also measured and shown
  in the metric detail; it is the mode whose logits match the TF reference
  to <=1e-4.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessing_tpu.models import PointNet

NORTH_STAR = 10_000.0  # clouds/s/chip (BASELINE.md)
WIDTH = 1024
NUM_CLASSES = 23
NUM_PARTS = 12


def bench_infer(batch_size: int, precision: str, steps: int = 30) -> float:
    model = PointNet(num_classes=NUM_CLASSES, num_parts=NUM_PARTS)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch_size, WIDTH, 3)).astype(np.float32)
    )
    variables = jax.device_put(model.init(jax.random.key(0), pts[:1], train=False))

    def forward_chained(variables, points):
        with jax.default_matmul_precision(precision):
            out = model.apply(variables, points, train=False)
        tie = (
            out["classification_output"].sum()
            + out["segmentation_output"].sum()
            + out["se3"].sum()
        )
        return points + tie * 1e-24

    f = jax.jit(forward_chained)
    x = f(variables, pts)
    _ = float(x[0, 0, 0])  # compile + sync

    x = pts
    t0 = time.perf_counter()
    for _ in range(steps):
        x = f(variables, x)
    _ = float(x[0, 0, 0])  # sync
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main() -> None:
    results: dict[str, tuple[float, int]] = {}
    for precision in ("default", "highest"):
        best, best_batch = 0.0, 0
        for batch_size in (1024, 2048):
            try:
                rate = bench_infer(batch_size, precision)
            except Exception as e:
                print(f"batch {batch_size} {precision} failed: {e}", file=sys.stderr)
                continue
            print(f"{precision} batch {batch_size}: {rate:.0f} clouds/s", file=sys.stderr)
            if rate > best:
                best, best_batch = rate, batch_size
        results[precision] = (best, best_batch)

    best, best_batch = results["default"]
    f32_exact = results.get("highest", (0.0, 0))[0]
    print(
        json.dumps(
            {
                "metric": (
                    f"pointnet_infer_clouds_per_sec_per_chip_{WIDTH}pt "
                    f"(batch {best_batch}; exact-f32 parity mode: {f32_exact:.0f})"
                ),
                "value": round(best, 1),
                "unit": "clouds/s",
                "vs_baseline": round(best / NORTH_STAR, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

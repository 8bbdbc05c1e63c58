"""Per-op device-time breakdown of a benchmark step via jax.profiler.

Runs one of the bench.py workloads under ``jax.profiler.trace`` and parses
the resulting .xplane.pb (tensorflow.tsl proto, bundled with the image's TF)
to print the top XLA ops by total device time. This is the measurement tool
behind the PERF.md fusion-level claims — the tunnel's rtt makes wall-clock
attribution at sub-ms scale meaningless, so per-op device events are the
only trustworthy signal.

Usage:
  python tools/trace_ops.py train      # b32/1024pt bf16 scan-32 train step
  python tools/trace_ops.py preprocess # config-2 voxel+window-normals
  python tools/trace_ops.py infer      # b2048/1024pt multi-head inference
"""

from __future__ import annotations

import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _run_train(n_dispatch: int = 2) -> int:
    """Dispatch the bench-config scanned train step; returns steps traced."""
    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.models import FreezeFlags, PointNet
    from pointcloudprocessing_tpu.train import steps as steps_lib

    chunk, batch, width = 32, 32, 1024
    model = PointNet(
        num_classes=23, num_parts=12,
        regularize_input_transform=True, regularize_feature_transform=True,
        dtype=jnp.bfloat16,
    )
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), width, LearningConfig(rate=1e-4), freeze,
        batch_size=1,
    )
    multi = steps_lib.make_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.01, 0.01, 0.01)
    )
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(chunk, batch, width, 3)).astype(np.float32))
    targets = {
        "classification_output": jnp.asarray(
            rng.integers(0, 23, (chunk, batch)).astype(np.int32)),
        "segmentation_output": jnp.asarray(
            rng.integers(0, 12, (chunk, batch, width)).astype(np.int32)),
        "se3": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (chunk, batch, 3, 3)).copy()),
    }
    key = jax.random.key(1)
    state, logs = multi(state, xs, targets, key)
    _ = float(logs["loss"][-1])  # compile + sync

    with jax.profiler.trace(_TRACE_DIR):
        for _ in range(n_dispatch):
            state, logs = multi(state, xs, targets, key)
        _ = float(logs["loss"][-1])
    return n_dispatch * chunk


def _run_preprocess(n_dispatch: int = 20) -> int:
    from pointcloudprocessing_tpu.ops import (
        estimate_normals_batch, voxel_downsample_batch,
    )

    batch, width = 8, 8192
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-30, 30, (batch, width, 3)).astype(np.float32)
    )

    @jax.jit
    def step(x):
        vox, mask = voxel_downsample_batch(x, 0.5)
        normals = estimate_normals_batch(vox, k=16, valid_mask=mask, method="window")
        return vox, normals

    out = step(pts)
    _ = float(out[0].ravel()[0])
    with jax.profiler.trace(_TRACE_DIR):
        for _ in range(n_dispatch - 1):
            step(pts)
        out = step(pts)
        _ = float(out[0].ravel()[0])
    return n_dispatch


def _run_infer(n_dispatch: int = 10) -> int:
    from pointcloudprocessing_tpu.models import PointNet

    batch, width = 2048, 1024
    model = PointNet(num_classes=23, num_parts=12)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, width, 3)).astype(np.float32)
    )
    variables = jax.device_put(model.init(jax.random.key(0), pts[:1], train=False))

    @jax.jit
    def step(points):
        return model.apply(variables, points, train=False)

    out = step(pts)
    _ = float(out["classification_output"].ravel()[0])
    with jax.profiler.trace(_TRACE_DIR):
        for _ in range(n_dispatch - 1):
            step(pts)
        out = step(pts)
        _ = float(out["classification_output"].ravel()[0])
    return n_dispatch


#: spans that measure occupancy (async DMA in flight) or contain other
#: events (the scan's while loop), not exclusive device compute time.
_ASYNC_PREFIXES = (
    "%copy-start", "%slice-start", "%while", "%all-reduce-start",
    "%collective", "%async", "%copy-done", "%slice-done",
)


def summarize(trace_dir: str, steps: int, top: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    per_op: dict[str, float] = collections.defaultdict(float)
    per_op_count: dict[str, int] = collections.defaultdict(int)
    async_totals: dict[str, float] = collections.defaultdict(float)
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            for line in plane.lines:
                # XLA Ops lines carry one event per fusion/kernel execution
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    meta = plane.event_metadata[ev.metadata_id]
                    dur_us = ev.duration_ps / 1e6
                    short = meta.name.split(" = ")[0]
                    if short.startswith(_ASYNC_PREFIXES):
                        async_totals[short] += dur_us
                        continue
                    per_op[meta.name] += dur_us
                    per_op_count[meta.name] += 1
    if not per_op:
        # dump plane/line inventory to debug naming assumptions
        for path in paths:
            space = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                space.ParseFromString(f.read())
            for plane in space.planes:
                print(f"plane: {plane.name!r} lines: {[l.name for l in plane.lines]}")
        raise SystemExit("no 'XLA Ops' events found on a TPU plane")

    grand = sum(per_op.values())
    whiles = {k: v for k, v in async_totals.items() if k.startswith("%while")}
    print(f"\nsync compute: {grand/steps:.1f} us/step over {steps} steps "
          f"({grand/1e3:.2f} ms traced; async/parent spans excluded)")
    for k, v in sorted(whiles.items(), key=lambda kv: -kv[1]):
        print(f"  parent {k}: {v/steps:.1f} us/step")
    others = sorted(
        ((k, v) for k, v in async_totals.items() if not k.startswith("%while")),
        key=lambda kv: -kv[1],
    )
    if others:
        print("  async spans (occupancy, may overlap compute):")
        for k, v in others[:12]:
            print(f"    {k}: {v/steps:.1f} us/step")
    print(f"\n{'us/step':>9}  {'%':>5}  {'n/step':>6}  op")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    for name, us in rows[:top]:
        print(f"{us/steps:9.1f}  {100*us/grand:5.1f}  "
              f"{per_op_count[name]/steps:6.1f}  {name[:110]}")
    rest = sum(us for _, us in rows[top:])
    if rest:
        print(f"{rest/steps:9.1f}  {100*rest/grand:5.1f}  {'':>6}  "
              f"(+{len(rows)-top} more)")


def _run_pn2(n_dispatch: int = 10) -> int:
    from pointcloudprocessing_tpu.models.pointnet2 import pointnet2_for_width

    batch, width = 256, 1024
    model = pointnet2_for_width(23, 12, width, dtype=jnp.bfloat16)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, width, 3)).astype(np.float32)
    )
    variables = jax.device_put(
        jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.key(0), pts[:1]
        )
    )

    @jax.jit
    def step(points):
        return model.apply(variables, points, train=False)

    out = step(pts)
    _ = float(out["classification_output"].ravel()[0])
    with jax.profiler.trace(_TRACE_DIR):
        for _ in range(n_dispatch - 1):
            step(pts)
        out = step(pts)
        _ = float(out["classification_output"].ravel()[0])
    return n_dispatch


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "train"
    _TRACE_DIR = tempfile.mkdtemp(prefix=f"trace_{what}_")
    steps = {"train": _run_train, "preprocess": _run_preprocess,
             "infer": _run_infer, "pn2": _run_pn2}[what]()
    print(f"trace dir: {_TRACE_DIR}")
    summarize(_TRACE_DIR, steps)

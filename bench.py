"""Benchmarks on one TPU chip, covering the five BASELINE.json configs.

stdout: ONE JSON line — the headline metric (1024-pt clouds/sec/chip,
multi-head PointNet inference; vs_baseline relative to the 10k north star).
stderr: the full config sweep —
  1. PointNet classification inference (single cloud p50 latency + batch)
  2. voxel downsample + kNN normal estimation (Mpoints/sec)
  3. training loop, 1024-pt clouds, batch 32, with T-Net regularization
  4. segmentation variant, 2048-pt clouds, batch 64
  5. end-to-end pipeline: scans -> voxel/FPS/normals -> PointNet, one fused
     XLA program per batch

Timing: the axon TPU tunnel dispatches asynchronously and
``block_until_ready`` does not wait for remote execution; a host READ of an
output is the only sync, and it costs a full ~25-30 ms tunnel round trip.
Throughput metrics therefore dispatch S INDEPENDENT steps and read one
scalar from the LAST output only — the device stream is FIFO, so the last
result landing means all S executed; the single rtt amortizes to rtt/S.
(The previous per-step chain-and-subtract-rtt scheme over-estimated small
steps by ~2 ms/step of rtt variance: config-2 preprocess measured 4.8 ms
chained vs 2.1 ms in the profiler trace / 2.7 ms pipelined.) The on-device
latency metric still uses a serially-dependent in-program chain, because
latency — unlike throughput — must not overlap steps.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessing_tpu.core.config import LearningConfig
from pointcloudprocessing_tpu.models import PointNet, FreezeFlags
from pointcloudprocessing_tpu.ops import (
    estimate_normals_batch,
    farthest_point_sample_and_gather,
    voxel_downsample_batch,
)
from pointcloudprocessing_tpu.train import steps as steps_lib

_T0 = time.perf_counter()  # process-level clock for the sweep wall budget

NORTH_STAR = 10_000.0  # clouds/s/chip (BASELINE.md)
NUM_CLASSES = 23
NUM_PARTS = 12


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _sync(out_tree) -> None:
    """One tunnel round trip: host-read a scalar from the tree."""
    _ = float(jax.tree_util.tree_leaves(out_tree)[0].ravel()[0])


def _pipelined_time(fn, x0, steps: int, reps: int = 3) -> float:
    """Seconds/step for ``steps`` INDEPENDENT dispatches of fn, one host
    sync on the last output (FIFO device stream). This is the serving
    pattern — batches don't depend on each other — and the ~25-30 ms
    tunnel rtt amortizes to rtt/steps. MEDIAN over ``reps``."""
    _sync(fn(x0))  # compile + sync
    per_step = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps - 1):
            fn(x0)
        _sync(fn(x0))
        per_step.append((time.perf_counter() - t0) / steps)
    return float(np.median(per_step))


def _tie(out_tree, x):
    total = sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out_tree))
    return x + total * 1e-24


def bench_infer(batch_size: int, width: int, precision: str, steps: int = 60,
                heads=("classification_output", "segmentation_output", "se3")) -> float:
    model = PointNet(num_classes=NUM_CLASSES, num_parts=NUM_PARTS)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch_size, width, 3)).astype(np.float32)
    )
    variables = jax.device_put(model.init(jax.random.key(0), pts[:1], train=False))

    @jax.jit
    def step(points):
        with jax.default_matmul_precision(precision):
            return model.apply(variables, points, train=False, heads=heads)

    dt = _pipelined_time(step, pts, steps)
    return batch_size / dt


def bench_infer_cls_only(batch_size: int = 2048, width: int = 1024) -> float:
    """Classification-only serving (heads subsetting skips the seg head,
    ~80% of the FLOPs) — the BASELINE config-1 workload is 'PointNet
    classification'; the headline metric stays the full multi-head model."""
    return bench_infer(batch_size, width, "default",
                       heads=("classification_output", "se3"))


def bench_infer_pointnet2(batch_size: int = 256, width: int = 1024,
                          steps: int = 60) -> float:
    """PointNet++ (SSG, canonical 512/128 SA config) multi-head inference —
    the beyond-reference family (models/pointnet2.py). Pallas FPS, MXU
    one-hot-matmul gathers, and PartialReduce kNN run inside the model
    program (docs/PERF.md "PointNet++ hotspots")."""
    from pointcloudprocessing_tpu.models.pointnet2 import pointnet2_for_width

    model = pointnet2_for_width(NUM_CLASSES, NUM_PARTS, width,
                                dtype=jnp.bfloat16)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch_size, width, 3)).astype(np.float32)
    )
    variables = jax.device_put(
        jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.key(0), pts[:1]
        )
    )

    @jax.jit
    def step(points):
        return model.apply(variables, points, train=False)

    dt = _pipelined_time(step, pts, steps)
    return batch_size / dt


def bench_infer_dgcnn(batch_size: int = 64, width: int = 1024,
                      steps: int = 40, graph: str = "dynamic",
                      k: int | None = None) -> float:
    """DGCNN (canonical k=20 EdgeConv) multi-head inference — the third
    model family (models/dgcnn.py). Per-layer dynamic kNN runs as an MXU
    distance matmul + PartialReduce approx_min_k; neighbor gathers are
    one-hot MXU matmuls (the PN++ hotspot fixes apply verbatim).

    ``graph='static'`` benches the static-graph serving opt-in: ONE
    input-space kNN shared by all four EdgeConvs — the Wang et al. 2019
    §5.1 fixed-graph ablation — so three of the four PartialReduce top-k
    calls and their (n, n) distance matmuls vanish."""
    from pointcloudprocessing_tpu.models.dgcnn import dgcnn_for_width

    model = dgcnn_for_width(NUM_CLASSES, NUM_PARTS, width,
                            dtype=jnp.bfloat16, graph=graph, k=k)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch_size, width, 3)).astype(np.float32)
    )
    variables = jax.device_put(
        jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.key(0), pts[:1]
        )
    )

    @jax.jit
    def step(points):
        return model.apply(variables, points, train=False)

    dt = _pipelined_time(step, pts, steps)
    return batch_size / dt


def bench_dispatch_overhead(steps: int = 100, reps: int = 3) -> tuple[float, float]:
    """Diagnostic: (per-dispatch overhead ms, one-read rtt ms) for a trivial
    program. Healthy tunnel: ~1-2 ms/dispatch, ~25-30 ms rtt. The r04
    artifact's single-dispatch rows collapsed ~5x (train b32 8,366 -> 1,448
    clouds/s) while scanned rows were flat — the signature of per-dispatch
    overhead rising toward a full rtt. This row makes that failure mode
    visible in every future artifact (docs/PERF.md "r04 single-dispatch
    anomaly")."""
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def tick(v):
        return v + 1.0

    _sync(tick(x))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tick(x))
        rtts.append(time.perf_counter() - t0)
    per_dispatch = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps - 1):
            tick(x)
        _sync(tick(x))
        per_dispatch.append((time.perf_counter() - t0) / steps)
    return (float(np.median(per_dispatch)) * 1e3, float(np.median(rtts)) * 1e3)


def bench_latency_p50(width: int = 1024, steps: int = 50) -> float:
    """Single-cloud inference p50 latency (ms). Per-call host sync — includes
    the tunnel round-trip, so this is an upper bound on on-device latency."""
    model = PointNet(num_classes=NUM_CLASSES, num_parts=NUM_PARTS)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, width, 3)).astype(np.float32))
    variables = jax.device_put(model.init(jax.random.key(0), pts, train=False))

    @jax.jit
    def step(points):
        out = model.apply(variables, points, train=False)
        return out["classification_output"]

    _ = np.asarray(step(pts))
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        _ = np.asarray(step(pts))
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50) * 1e3)


def bench_latency_on_device(width: int = 1024, chain: int = 500, reps: int = 5) -> float:
    """Single-cloud inference latency measured ON DEVICE: one jitted program
    runs ``chain`` serially-dependent inferences (each step's logits fold
    into the next input, so the device cannot overlap them) and the host
    syncs once — per-step time excludes the tunnel round-trip entirely."""
    model = PointNet(num_classes=NUM_CLASSES, num_parts=NUM_PARTS)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, width, 3)).astype(np.float32))
    variables = jax.device_put(model.init(jax.random.key(0), pts, train=False))

    @jax.jit
    def chained(points):
        def body(x, _):
            out = model.apply(variables, x, train=False)
            x = _tie(out, x)
            return x, ()

        x, _ = jax.lax.scan(body, points, None, length=chain)
        return x

    @jax.jit
    def noop(points):
        return points + 1e-24

    x = chained(pts)
    _ = float(x.ravel()[0])  # compile + sync
    _ = float(noop(pts).ravel()[0])
    # measured floor of one dispatch+sync through the tunnel — subtracted so
    # the result is device execution time, not rtt/chain
    rtt = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(noop(pts).ravel()[0])
        rtt.append(time.perf_counter() - t0)
    times = []
    x = pts
    for _ in range(reps):
        t0 = time.perf_counter()
        x = chained(x)
        _ = float(x.ravel()[0])
        times.append(time.perf_counter() - t0)
    raw = float(np.median(times))
    corrected = raw - float(np.median(rtt))
    # tunnel-timing variance can push the correction past zero on a long
    # chain; fall back to the (slightly rtt-inflated) upper bound then
    per_step = corrected if corrected > 0 else raw
    return float(per_step / chain * 1e3)


def bench_latency_e2e_on_device(
    width_in: int = 2048, width_out: int = 1024, chain: int = 200, reps: int = 5
) -> float:
    """Single-cloud END-TO-END latency on device (voxel -> FPS -> PointNet,
    the serving request path as ONE program) — same chained-dependency
    methodology as bench_latency_on_device. Fills the preprocess line of
    the serving latency budget (docs/PERF.md) with a measurement instead
    of an estimate."""
    model = PointNet(num_classes=NUM_CLASSES, num_parts=NUM_PARTS)
    scan = jnp.asarray(
        np.random.default_rng(0).uniform(-12, 12, (1, width_in, 3)).astype(np.float32)
    )
    dummy = jnp.zeros((1, width_out, 3), jnp.float32)
    variables = jax.device_put(model.init(jax.random.key(0), dummy, train=False))

    @jax.jit
    def chained(x):
        def body(carry, _):
            vox, mask = voxel_downsample_batch(carry, 0.4, layout="bcn")
            _, sampled = farthest_point_sample_and_gather(
                vox, width_out, mask, layout="bcn"
            )
            out = model.apply(variables, sampled, train=False)
            return _tie(out, carry), ()

        x, _ = jax.lax.scan(body, x, None, length=chain)
        return x

    @jax.jit
    def noop(x):
        return x + 1e-24

    x = chained(scan)
    _ = float(x.ravel()[0])
    _ = float(noop(scan).ravel()[0])
    rtt = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(noop(scan).ravel()[0])
        rtt.append(time.perf_counter() - t0)
    times = []
    x = scan
    for _ in range(reps):
        t0 = time.perf_counter()
        x = chained(x)
        _ = float(x.ravel()[0])
        times.append(time.perf_counter() - t0)
    raw = float(np.median(times))
    corrected = raw - float(np.median(rtt))
    per_step = corrected if corrected > 0 else raw
    return float(per_step / chain * 1e3)


def bench_preprocess(batch: int = 8, width: int = 8192, steps: int = 240,
                     chunk: int = 16, window: int = 256) -> float:
    """Voxel downsample + kNN PCA normals, Mpoints/sec (config 2 shape: one
    F-15 LiDAR scan is 8192 points).

    Plane-major (b, 3, n) end to end — the sort emits coordinate planes and
    the Pallas kernels consume them, so no (b, n, 3) relayout copy exists
    anywhere. ``chunk`` batches ride one dispatch via ``lax.scan``
    (amortizes the ~2 ms host/tunnel submission per dispatch, same as the
    training loop's steps_per_dispatch), and ``steps`` must be large:
    the ONE ~25 ms rtt sync per chain costs rtt/steps per step — at the
    old steps=50 that was a 0.5 ms/step bias on a 1.2 ms device step."""
    pts = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-30, 30, (chunk, batch, width, 3))
        .astype(np.float32)
    )

    @jax.jit
    def multi(xs):
        def body(carry, x):
            vox, mask = voxel_downsample_batch(x, 0.5, layout="bcn")
            # windowed Pallas path: voxel output is Morton-ordered, so the
            # kernel's index-window candidate set is spatially valid (median
            # angle error vs exact < 0.5 deg, test_preprocess_ops.py)
            normals = estimate_normals_batch(
                vox, k=16, valid_mask=mask, method="window", layout="bcn",
                window=window,
            )
            return carry, (vox, normals)
        _, outs = jax.lax.scan(body, 0, xs)
        return outs

    dt = _pipelined_time(multi, pts, max(steps // chunk, 2)) / chunk
    return batch * width / dt / 1e6


def bench_train_step(
    batch: int = 32, width: int = 1024, steps: int = 100, dtype=None
) -> float:
    """Full train step (jitter+fwd+bwd+Adam), T-Net regularization on
    (config 3). ``dtype=bfloat16`` runs the trunk in MXU-native precision
    (the training path is HBM-bound on activations; bf16 halves the bill)."""
    model = PointNet(
        num_classes=NUM_CLASSES, num_parts=NUM_PARTS,
        regularize_input_transform=True, regularize_feature_transform=True,
        dtype=dtype,
    )
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), width, LearningConfig(rate=1e-4), freeze,
        batch_size=1,
    )
    train_step = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.01, 0.01, 0.01)
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, width, 3)).astype(np.float32))
    targets = {
        "classification_output": jnp.asarray(rng.integers(0, NUM_CLASSES, batch).astype(np.int32)),
        "segmentation_output": jnp.asarray(rng.integers(0, NUM_PARTS, (batch, width)).astype(np.int32)),
        "se3": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))),
    }
    key = jax.random.key(1)

    state, logs = train_step(state, x, targets, key)  # compile
    _ = float(logs["loss"])
    per_step = []
    for _ in range(3):  # median-of-3: tunnel timing varies +-30% per chain
        t0 = time.perf_counter()
        for _ in range(steps):
            state, logs = train_step(state, x, targets, key)
        _ = float(logs["loss"])  # loss depends on params -> syncs the chain
        per_step.append((time.perf_counter() - t0) / steps)
    return batch / float(np.median(per_step))


def bench_train_multi_step(
    batch: int = 32, width: int = 1024, chunk: int = 32, rounds: int = 8, dtype=None,
    unroll: int = 1, moment_dtype=None,
) -> float:
    """Training with ``chunk`` scanned steps per dispatch (the production
    loop's steps_per_dispatch) — amortizes the per-call host/tunnel overhead
    that dominates small-batch training. ``moment_dtype=bfloat16`` stores
    both Adam moments rounded (the `optimizer_moment_dtype` config opt-in —
    halves the optimizer-boundary HBM bill the round-5 gap trace measured)."""
    model = PointNet(
        num_classes=NUM_CLASSES, num_parts=NUM_PARTS,
        regularize_input_transform=True, regularize_feature_transform=True,
        dtype=dtype,
    )
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), width, LearningConfig(rate=1e-4), freeze,
        batch_size=1, moment_dtype=moment_dtype,
    )
    multi = steps_lib.make_train_multi_step(
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
    key = jax.random.key(1)

    state, logs = multi(state, xs, targets, key)  # compile
    _ = float(logs["loss"][-1])
    per_step = []
    for _ in range(3):  # median-of-3 chains (tunnel noise); one sync per chain
        t0 = time.perf_counter()
        for _ in range(rounds):
            state, logs = multi(state, xs, targets, key)
        _ = float(logs["loss"][-1])  # param-dependent -> syncs the chain
        per_step.append((time.perf_counter() - t0) / (rounds * chunk))
    return batch / float(np.median(per_step))


def bench_e2e_pipeline(
    batch: int = 256, width_in: int = 2048, width_out: int = 1024,
    steps: int = 90,
) -> tuple[float, float, float]:
    """Streamed scans -> voxel/FPS/normals -> PointNet classify, single fused
    XLA program per batch (config 5)."""
    model = PointNet(num_classes=NUM_CLASSES, num_parts=NUM_PARTS)
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-20, 20, (batch, width_in, 3)).astype(np.float32)
    )
    dummy = jnp.zeros((1, width_out, 3), jnp.float32)
    variables = jax.device_put(model.init(jax.random.key(0), dummy, train=False))

    @jax.jit
    def step(x):
        vox, mask = voxel_downsample_batch(x, 0.4, layout="bcn")
        _, sampled = farthest_point_sample_and_gather(
            vox, width_out, mask, layout="bcn"
        )
        return model.apply(variables, sampled, train=False)

    # full config-5 fidelity: normals ride the Morton-ordered voxel output
    # (windowed Pallas kernel) BEFORE FPS (FPS's selection order has no
    # spatial locality), and the model runs classification-only ('PointNet
    # classify'); reported separately so e2e_pipeline stays comparable
    # across rounds (same composition as BENCH_r01)
    @jax.jit
    def step_with_normals(x):
        vox, mask = voxel_downsample_batch(x, 0.4, layout="bcn")
        normals = estimate_normals_batch(
            vox, k=16, valid_mask=mask, method="window", window=128,
            layout="bcn",
        )
        _, sampled = farthest_point_sample_and_gather(
            vox, width_out, mask, layout="bcn"
        )
        out = model.apply(variables, sampled, train=False,
                          heads=("classification_output", "se3"))
        return out, normals

    # serving-path variant: O(n) Morton-stride stratified sampling instead
    # of the serial FPS loop (opt-in; covering radius ~1.5-2x exact FPS on
    # volume data — see ops/fps.py::stride_sample_and_gather)
    from pointcloudprocessing_tpu.ops import stride_sample_and_gather

    @jax.jit
    def step_stride(x):
        vox, mask = voxel_downsample_batch(x, 0.4)
        _, sampled = stride_sample_and_gather(vox, width_out, mask)
        return model.apply(variables, sampled, train=False)

    dt = _pipelined_time(step, pts, steps)
    dt_n = _pipelined_time(step_with_normals, pts, steps)
    dt_s = _pipelined_time(step_stride, pts, steps)
    return batch / dt, batch / dt_n, batch / dt_s


def bench_e2e_flagship_8192(
    batch: int = 64, width_in: int = 8192, width_out: int = 1024,
    steps: int = 60,
) -> tuple[float, float]:
    """Flagship-width serving: 8192-pt scans (the kc46/f15 configs'
    input_width — kc46_lidar_config.json:98) -> voxel -> sampler ->
    classify, one fused program. Returns (exact-FPS, Morton-stride)
    clouds/s; the stride sampler's O(n) win over the serial FPS loop grows
    with scan width (ops/fps.py)."""
    model = PointNet(num_classes=NUM_CLASSES, num_parts=NUM_PARTS)
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-20, 20, (batch, width_in, 3)).astype(np.float32)
    )
    dummy = jnp.zeros((1, width_out, 3), jnp.float32)
    variables = jax.device_put(model.init(jax.random.key(0), dummy, train=False))

    from pointcloudprocessing_tpu.ops import stride_sample_and_gather

    @jax.jit
    def step_fps(x):
        vox, mask = voxel_downsample_batch(x, 0.4, layout="bcn")
        _, sampled = farthest_point_sample_and_gather(
            vox, width_out, mask, layout="bcn"
        )
        return model.apply(variables, sampled, train=False,
                           heads=("classification_output", "se3"))

    @jax.jit
    def step_stride(x):
        vox, mask = voxel_downsample_batch(x, 0.4)
        _, sampled = stride_sample_and_gather(vox, width_out, mask)
        return model.apply(variables, sampled, train=False,
                           heads=("classification_output", "se3"))

    dt_f = _pipelined_time(step_fps, pts, steps)
    dt_s = _pipelined_time(step_stride, pts, steps)
    return batch / dt_f, batch / dt_s


def main() -> None:
    # headline metric FIRST (the extras below pay multi-minute remote
    # compiles; stdout must carry the JSON even if the run is cut short).
    # The remote compile service intermittently degrades to many minutes
    # per program (docs/PERF.md "r04 single-dispatch anomaly" note); the
    # headline loop therefore stops starting new configs once half the
    # wall budget is gone, so the JSON always reaches stdout inside the
    # driver window — a partial headline beats a truncated artifact.
    headline_deadline = _T0 + 0.5 * float(os.environ.get("BENCH_BUDGET_S",
                                                         "1380"))
    results: dict[str, tuple[float, int]] = {}
    for precision in ("default", "highest"):
        best, best_batch = 0.0, 0
        for batch_size in (1024, 2048):
            # always attempt at least ONE default-precision config (the
            # headline value); everything else yields to the deadline
            must_run = precision == "default" and not best
            if not must_run and time.perf_counter() > headline_deadline:
                log(f"[1] infer {precision} batch {batch_size}: skipped "
                    "(past headline deadline — degraded compile service)")
                continue
            try:
                rate = bench_infer(batch_size, 1024, precision)
            except Exception as e:
                log(f"infer batch {batch_size} {precision} failed: {e}")
                continue
            log(f"[1] infer {precision} batch {batch_size}: {rate:.0f} clouds/s")
            if rate > best:
                best, best_batch = rate, batch_size
        results[precision] = (best, best_batch)

    best, best_batch = results["default"]
    f32_exact = results.get("highest", (0.0, 0))[0]
    print(
        json.dumps(
            {
                "metric": (
                    f"pointnet_infer_clouds_per_sec_per_chip_1024pt "
                    f"(batch {best_batch}; exact-f32 parity mode {f32_exact:.0f}; "
                    f"secondary configs on stderr)"
                ),
                "value": round(best, 1),
                "unit": "clouds/s",
                "vs_baseline": round(best / NORTH_STAR, 3),
            }
        ),
        flush=True,
    )

    if "--primary-only" in sys.argv:
        return

    # Secondary sweep under a global wall budget (BENCH_BUDGET_S, measured
    # from process start): the r04 driver run hit its window (rc=124) and
    # every row after train_scan32_bf16 was lost from the artifact. Rows
    # are therefore (a) priority-ordered — diagnostics and the rows absent
    # from BENCH_r04 first, the multi-minute train family last — and
    # (b) skipped with an explicit log line once the deadline passes, so
    # the sweep always ends cleanly inside the driver window.
    budget = float(os.environ.get("BENCH_BUDGET_S", "1380"))
    deadline = _T0 + budget

    def run_row(name, fn, fmt=None):
        if time.perf_counter() > deadline:
            log(f"[-] {name}: skipped (past {budget:.0f}s budget)")
            return
        try:
            val = fn()
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {e}")
            return
        log(f"[*] {name}: {fmt(val) if fmt else f'{val:.4g}'}")

    run_row("dispatch_overhead_ms/rtt_ms", bench_dispatch_overhead,
            fmt=lambda v: f"{v[0]:.3g} / {v[1]:.3g}")
    run_row("dgcnn_infer_clouds_per_s_b64", bench_infer_dgcnn)
    run_row("dgcnn_static_infer_clouds_per_s_b64",
            lambda: bench_infer_dgcnn(graph="static"))
    run_row("pointnet2_infer_clouds_per_s_b256", bench_infer_pointnet2)
    run_row("seg2048_b64_clouds_per_s", lambda: bench_infer(64, 2048, "default"))

    def row_e2e():
        e2e, e2e_normals, e2e_stride = bench_e2e_pipeline()
        log(f"[*] e2e_with_normals_clouds_per_s: {e2e_normals:.4g}")
        log(f"[*] e2e_stride_serving_clouds_per_s: {e2e_stride:.4g}")
        return e2e

    run_row("e2e_pipeline_clouds_per_s", row_e2e)

    def row_8192():
        fps8k, stride8k = bench_e2e_flagship_8192()
        log(f"[*] e2e_8192pt_stride_clouds_per_s: {stride8k:.4g} "
            f"({stride8k * 8192 / 1e6:.3g} Mpts/s scan intake)")
        return fps8k

    run_row("e2e_8192pt_fps_clouds_per_s", row_8192)
    run_row("preprocess_Mpts_per_s", bench_preprocess)
    run_row("infer_cls_only_clouds_per_s", bench_infer_cls_only)
    run_row("latency_p50_ms (tunnel upper bound)", bench_latency_p50)
    run_row("latency_on_device_ms", bench_latency_on_device)
    run_row("latency_e2e_on_device_ms", bench_latency_e2e_on_device)
    run_row("train_scan64_bf16_clouds_per_s_b32",
            lambda: bench_train_multi_step(chunk=64, dtype=jnp.bfloat16))
    run_row("train_scan32_bf16_clouds_per_s_b32",
            lambda: bench_train_multi_step(dtype=jnp.bfloat16))
    run_row("train_clouds_per_s_b32", bench_train_step)
    run_row("train_bf16_clouds_per_s_b32",
            lambda: bench_train_step(dtype=jnp.bfloat16))
    run_row("train_scan32_clouds_per_s_b32", bench_train_multi_step)
    run_row("train_scan64u4_bf16_clouds_per_s_b32",
            lambda: bench_train_multi_step(chunk=64, dtype=jnp.bfloat16,
                                           unroll=4))
    run_row("train_scan64u4_bf16mom_clouds_per_s_b32",
            lambda: bench_train_multi_step(chunk=64, dtype=jnp.bfloat16,
                                           unroll=4,
                                           moment_dtype=jnp.bfloat16))
    log(f"[=] sweep wall: {time.perf_counter() - _T0:.0f}s "
        f"(budget {budget:.0f}s)")


if __name__ == "__main__":
    main()

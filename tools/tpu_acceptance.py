"""Hardware-numerics acceptance checks, run on a real TPU chip.

The CPU test suite cannot catch TPU-only numerics regressions: on CPU
every matmul is exact f32 and Pallas runs in interpret mode. Two real
bugs motivated this harness (round 2, docs/PERF.md):

- the kNN pairwise-distance expansion ran at the MXU default single-bf16
  pass — 7.6 deg median normal error at 25 m scene offsets;
- the voxel segment-reduce contraction did the same — 6 cm centroid error
  — and the naive fix (hi/lo split in the XLA graph) was silently folded
  away by the algebraic simplifier.

Run: ``python tools/tpu_acceptance.py`` (env preset JAX_PLATFORMS=axon).
Prints one PASS/FAIL line per check; exit code 1 if any check fails.
Keep every threshold tied to a physical contract (mm, degrees), not to
"whatever the code does today".
"""

from __future__ import annotations

import os
import sys
import unittest.mock as um

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FAILURES: list[str] = []


def check(name: str, value: float, bound: float, unit: str) -> None:
    ok = value <= bound
    tag = "PASS" if ok else "FAIL"
    print(f"[{tag}] {name}: {value:.3g} {unit} (bound {bound:g})", flush=True)
    if not ok:
        _FAILURES.append(name)


def _cpu_reference():
    """Context that routes the library's backend dispatch to the exact CPU
    paths (scatter-based segment_sum, interpret-mode Pallas)."""
    import pointcloudprocessing_tpu.ops.pallas.voxel_reduce as vr
    import pointcloudprocessing_tpu.ops.pallas.window_normals as wn
    import pointcloudprocessing_tpu.ops.pallas.fps as fp
    import contextlib

    cpu = jax.devices("cpu")[0]
    ctx = contextlib.ExitStack()
    ctx.enter_context(jax.default_device(cpu))
    for mod in (vr, wn, fp):
        ctx.enter_context(um.patch.object(mod, "_interpret", lambda: True))
    ctx.enter_context(um.patch.object(jax, "default_backend", lambda: "cpu"))
    return ctx


def check_voxel_centroids() -> None:
    """TPU voxel centroids vs the exact CPU segment_sum path: ≤ 1 mm at a
    30 m uniform scene (regression bound for the reduce contraction)."""
    from pointcloudprocessing_tpu.ops import voxel_downsample_batch

    rng = np.random.default_rng(5)
    pts = rng.uniform(-30, 30, (4, 2048, 3)).astype(np.float32)
    vox_t, mask_t = jax.jit(lambda x: voxel_downsample_batch(x, 0.4))(
        jnp.asarray(pts)
    )
    with _cpu_reference():
        vox_c, _ = voxel_downsample_batch(jnp.asarray(pts), 0.4)
    err = np.abs(np.asarray(vox_t) - np.asarray(vox_c))[np.asarray(mask_t)]
    check("voxel centroid error vs exact", float(err.max()) * 1e3, 1.0, "mm")


def _sphere_scene(n=8192, b=4, offset=25.0):
    rng = np.random.default_rng(3)
    th = rng.uniform(0, np.pi, (b, n))
    ph = rng.uniform(0, 2 * np.pi, (b, n))
    pts = np.stack(
        [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)], -1
    ) * 10.0
    return jnp.asarray(
        (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    ) + offset


def check_normals() -> None:
    """Windowed and exact normals on an offset sphere: the windowed kernel
    vs the exact path (quality contract) and exact-TPU vs exact-CPU (the
    distance-expansion precision contract)."""
    from pointcloudprocessing_tpu.ops import voxel_downsample_batch
    from pointcloudprocessing_tpu.ops.normals import estimate_normals_batch

    pts = _sphere_scene()
    vox, mask = voxel_downsample_batch(pts, 0.25)
    nw = np.asarray(
        estimate_normals_batch(vox, k=16, valid_mask=mask, method="window")
    )
    ne = np.asarray(
        estimate_normals_batch(vox, k=16, valid_mask=mask, method="exact")
    )
    with _cpu_reference():
        ne_c = np.asarray(
            estimate_normals_batch(
                jnp.asarray(np.asarray(vox)),
                k=16,
                valid_mask=jnp.asarray(np.asarray(mask)),
                method="exact",
            )
        )
    m = np.asarray(mask)

    def ang(a, b):
        d = np.clip(np.abs(np.sum(a * b, -1))[m], 0, 1)
        return np.degrees(np.arccos(d))

    a_we = ang(nw, ne)
    a_tc = ang(ne, ne_c)
    check("window-vs-exact normals median", float(np.median(a_we)), 1.0, "deg")
    check("window-vs-exact normals p95", float(np.percentile(a_we, 95)), 5.0, "deg")
    check("exact normals TPU-vs-CPU median", float(np.median(a_tc)), 0.1, "deg")


def check_rigid_alignment() -> None:
    """Kabsch + ICP must recover a known small transform at 30 m offsets
    to sub-mm RMSE (the transform-application precision contract)."""
    from pointcloudprocessing_tpu.ops.mat_ops import solve_kabsch
    from pointcloudprocessing_tpu.ops.icp import icp

    rng = np.random.default_rng(1)
    src = rng.normal(size=(400, 3)).astype(np.float32) * 5 + 30
    a = 0.05
    rot = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )
    tgt = src @ rot.T + np.array([0.3, -0.2, 0.4], np.float32)
    _, _, rmse_k = solve_kabsch(jnp.asarray(tgt), jnp.asarray(src))
    _, _, rmse_i = icp(jnp.asarray(src), jnp.asarray(tgt), iterations=10)
    check("kabsch recovery rmse", float(rmse_k) * 1e3, 0.1, "mm")
    check("icp recovery rmse", float(rmse_i) * 1e3, 1.0, "mm")


def check_fps_selection() -> None:
    """The Pallas FPS kernel must select the same points as the exact
    'stream' formulation (both use exact squared differences)."""
    from pointcloudprocessing_tpu.ops.fps import farthest_point_sample_batch

    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(4, 512, 3)).astype(np.float32))
    got = np.asarray(
        farthest_point_sample_batch(pts, 64, method="pallas")
    )
    ref = np.asarray(
        farthest_point_sample_batch(pts, 64, method="stream")
    )
    check(
        "pallas-vs-stream FPS selection mismatches",
        float((got != ref).sum()),
        0.0,
        "indices",
    )


def check_inference_precision_drift() -> None:
    """Default-precision logits vs exact-f32 logits on the flagship model:
    drift must stay within the serving tolerance (1e-2 on softmax logits —
    default precision is the serving path, exact-f32 is the parity path)."""
    from pointcloudprocessing_tpu.models import PointNet

    model = PointNet(num_classes=23, num_parts=12)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 1024, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:1], train=False)

    # inputs MUST be jit arguments: closing over concrete arrays in a
    # zero-arg jit lets XLA constant-fold the whole model on the host
    # (exact f32 both times — the check returned 0 drift, vacuously)
    def run(points, precision):
        with jax.default_matmul_precision(precision):
            return model.apply(variables, points, train=False)

    o_d = jax.jit(lambda p: run(p, "default"))(x)
    o_h = jax.jit(lambda p: run(p, "highest"))(x)
    drift = max(
        float(jnp.max(jnp.abs(o_d[k] - o_h[k])))
        for k in ("classification_output", "segmentation_output")
    )
    check("inference default-vs-exact drift", drift, 1e-2, "prob")


def check_shardmap_pipeline() -> None:
    """The fused serving pipeline (voxel -> FPS -> PointNet, with its Pallas
    custom calls) run under ``shard_map`` on a real-chip mesh must match the
    plain single-device program bit-for-bit. test_pipeline.py pins this on
    the 8-device CPU mesh in interpret mode only; this check exercises the
    custom-call path through shard_map on TPU hardware (1-device "data"
    mesh — the per-shard program is identical to the multi-chip one, there
    are no collectives at inference)."""
    from jax.sharding import Mesh

    from pointcloudprocessing_tpu.models import PointNet
    from pointcloudprocessing_tpu.models.pipeline import PointCloudPipeline

    model = PointNet(num_classes=23, num_parts=12)
    rng = np.random.default_rng(7)
    scans = rng.uniform(-12, 12, (8, 2048, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(scans[:1, :1024]),
                           train=False)

    kwargs = dict(scan_width=2048, model_width=1024, voxel_size=0.4,
                  sampler="fps")
    plain = PointCloudPipeline(model, variables, **kwargs)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    sharded = PointCloudPipeline(model, variables, mesh=mesh, **kwargs)

    o_p = plain(scans)
    o_s = sharded(scans)
    drift = max(
        float(jnp.max(jnp.abs(o_p[k] - o_s[k])))
        for k in ("classification_output", "segmentation_output")
    )
    check("shard_map-vs-plain pipeline drift", drift, 0.0, "prob")


def check_pooled_chain_training() -> None:
    """The Pallas fused pooled-chain training path (models/fused_pool.py ->
    ops/pallas/pooled_chain.py) on real hardware vs the jnp formulation of
    the same bf16 custom VJP. test_pooled_chain.py pins this in interpret
    mode on CPU; Mosaic lowering (packed-int max, bitcasts) must agree on
    the actual chip. Gradients compare in aggregate Frobenius (the packed
    argmax rounds the pooled value to 23 - log2(n) mantissa bits)."""
    from pointcloudprocessing_tpu.core.constants import KERAS_BN_EPSILON
    from pointcloudprocessing_tpu.models import fused_pool

    rng = np.random.default_rng(3)
    b, n, cin, c = 8, 1024, 128, 1024
    x = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(cin, c)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.2)
    cfg_bf16 = (False, 0.99, KERAS_BN_EPSILON, jnp.bfloat16)
    cfg_f32 = (False, 0.99, KERAS_BN_EPSILON, None)
    zeros, ones = jnp.zeros(c), jnp.ones(c)

    def make_loss(cfg):
        def loss(kernel, scale, bias):
            out, _, _ = fused_pool.dense_bn_relu_max(
                cfg, x, kernel, scale, bias, zeros, ones
            )
            return jnp.mean(jnp.square(out))
        return loss

    assert fused_pool._use_pallas(cfg_bf16, x.astype(jnp.bfloat16), kernel), (
        "Pallas pooled-chain path not active on this backend/shape"
    )
    got = jax.jit(jax.grad(make_loss(cfg_bf16), argnums=(0, 1, 2)))(
        kernel, scale, bias)
    orig = fused_pool._use_pallas
    fused_pool._use_pallas = lambda *a: False
    try:
        ref = jax.jit(jax.grad(make_loss(cfg_bf16), argnums=(0, 1, 2)))(
            kernel, scale, bias)
        want = jax.jit(jax.grad(make_loss(cfg_f32), argnums=(0, 1, 2)))(
            kernel, scale, bias)
    finally:
        fused_pool._use_pallas = orig

    def fro(a, b):
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-6))

    # both bf16 paths carry winner-rounding noise, so they diverge from
    # EACH OTHER by ~sqrt(2)x their individual f32 distance; the meaningful
    # hardware assertion is that the Pallas path lands no farther from the
    # exact f32 gradient than the jnp bf16 path it replaces (+ margin)
    worst_gap = max(
        fro(g, w) - fro(r, w) for g, r, w in zip(got, ref, want)
    )
    check("pooled-chain Pallas-vs-f32 grad excess over jnp-bf16",
          worst_gap, 0.05, "rel")
    check("pooled-chain Pallas-vs-f32 grad Frobenius",
          max(fro(g, w) for g, w in zip(got, want)), 0.25, "rel")


def check_shardmap_training() -> None:
    """The shard_map DP training mode on HARDWARE (1-device 'data' mesh):
    the per-shard program — Pallas pooled-chain kernels included (bf16
    batch-stats mode) — must reproduce the plain jit step exactly when the
    axis size is 1 (pmean over one replica is the identity; jitter 0 and
    dropout 0 make the per-replica rng folds inert). This is the
    multi-chip training mode's hardware smoke: tests cover it only in
    CPU interpret mode."""
    from jax.sharding import Mesh

    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.models import FreezeFlags, PointNet
    from pointcloudprocessing_tpu.train import steps as steps_lib

    b, w = 8, 1024
    model = PointNet(num_classes=8, num_parts=4, dropout_rate=0.0,
                     dtype=jnp.bfloat16)
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), w, LearningConfig(rate=1e-3), freeze,
        batch_size=1,
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    sm = steps_lib.make_shardmap_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0), mesh
    )
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.normal(size=(1, b, w, 3)).astype(np.float32))
    ts = {
        "classification_output": jnp.asarray(
            rng.integers(0, 8, (1, b)).astype(np.int32)),
        "segmentation_output": jnp.asarray(
            rng.integers(0, 4, (1, b, w)).astype(np.int32)),
        "se3": jnp.asarray(np.broadcast_to(
            np.eye(3, dtype=np.float32), (1, b, 3, 3)).copy()),
    }
    _, logs_sm = sm(state, xs, ts, jax.random.key(3))

    state2, _ = steps_lib.init_train_state(
        model, jax.random.key(0), w, LearningConfig(rate=1e-3), freeze,
        batch_size=1,
    )
    plain = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )
    _, logs_plain = plain(state2, xs[0], {k: v[0] for k, v in ts.items()},
                          jax.random.key(3))
    drift = abs(float(logs_sm["loss"][0]) - float(logs_plain["loss"]))
    check("shard_map-vs-plain bf16 train-step loss drift", drift, 1e-5, "abs")


def check_onehot_gather() -> None:
    """ops/gather one-hot MXU matmul selection vs the native gather ON
    HARDWARE: bf16 sources must match bit-exactly (one nonzero product per
    output element — any MXU accumulation surprise would show here), f32
    hi/lo within its 2^-17 design bound. Guards the PointNet++ grouping
    path the same way the pooled-chain check guards training."""
    from pointcloudprocessing_tpu.ops.gather import gather_rows_matmul

    rng = np.random.default_rng(7)
    x32 = jnp.asarray(rng.normal(size=(4, 512, 64)).astype(np.float32) * 21.0)
    idx = jnp.asarray(rng.integers(0, 512, (4, 128, 16)).astype(np.int32))
    want32 = jnp.take_along_axis(
        x32, idx.reshape(4, -1)[..., None], axis=1
    ).reshape(4, 128, 16, 64)

    got32 = jax.jit(gather_rows_matmul)(x32, idx)
    rel32 = float(
        jnp.max(jnp.abs(got32 - want32)) / jnp.max(jnp.abs(want32))
    )
    check("one-hot gather f32 hi/lo rel err", rel32, 2.0 ** -15, "rel")

    x16 = x32.astype(jnp.bfloat16)
    want16 = jnp.take_along_axis(
        x16, idx.reshape(4, -1)[..., None], axis=1
    ).reshape(4, 128, 16, 64)
    got16 = jax.jit(gather_rows_matmul)(x16, idx)
    exact = float(
        jnp.max(jnp.abs(got16.astype(jnp.float32) - want16.astype(jnp.float32)))
    )
    check("one-hot gather bf16 exactness", exact, 0.0, "abs")


def check_gather_maxmin_kernel() -> None:
    """VMEM lane-gather max/min kernel (ops/pallas/gather_maxmin.py) vs the
    native gather ON HARDWARE: the chunk-select dynamic_gather decomposition
    must be EXACT in bf16 and f32 (selection + max/min create no new
    values; the internal f32 upcast round-trips bf16 bit-exactly)."""
    from pointcloudprocessing_tpu.ops.pallas.gather_maxmin import (
        gather_maxmin,
        lane_kernel_applicable,
    )

    rng = np.random.default_rng(13)
    idx = jnp.asarray(rng.integers(0, 512, (4, 512, 20)).astype(np.int32))
    for dtype in (jnp.bfloat16, jnp.float32):
        q = jnp.asarray(
            rng.normal(size=(4, 512, 64)).astype(np.float32) * 17.0
        ).astype(dtype)
        assert lane_kernel_applicable(512, 64, dtype)
        got_mx, got_mn = jax.jit(gather_maxmin)(q, idx)
        g = jnp.take_along_axis(
            q.astype(jnp.float32), idx.reshape(4, -1)[..., None], axis=1
        ).reshape(4, 512, 20, 64)
        want_mx, want_mn = jnp.max(g, axis=2), jnp.min(g, axis=2)
        err = float(
            jnp.maximum(
                jnp.max(jnp.abs(got_mx.astype(jnp.float32) - want_mx)),
                jnp.max(jnp.abs(got_mn.astype(jnp.float32) - want_mn)),
            )
        )
        check(f"gather_maxmin lane kernel {jnp.dtype(dtype).name} exactness",
              err, 0.0, "abs")


def check_dgcnn_factored_edge() -> None:
    """DGCNN's factored split-kernel edge block vs the literal edge-tensor
    dataflow ON HARDWARE, where both ride the one-hot MXU gathers and the
    factored path additionally collapses the neighbor max under fixed BN
    stats. The CPU equality test (test_dgcnn.py) covers the native-gather
    backend only; this pins the TPU dataflow pair in bf16 (the serving
    configuration) against each other."""
    from pointcloudprocessing_tpu.models.dgcnn import dgcnn_for_width

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(8, 256, 3)).astype(np.float32))
    outs = {}
    # exact_knn shares one deterministic graph between the two dataflows:
    # with approx_min_k, bf16 rounding perturbs the per-layer feature
    # spaces enough to select DIFFERENT neighbors after ec1, and the check
    # would measure graph divergence, not the factoring's numeric error
    for impl in ("reference", "factored"):
        model = dgcnn_for_width(
            23, 12, 256, dtype=jnp.bfloat16, edge_impl=impl, exact_knn=True
        )
        variables = jax.jit(
            lambda r, x, m=model: m.init(r, x, train=False)
        )(jax.random.key(0), pts[:1])
        outs[impl] = jax.jit(
            lambda v, x, m=model: m.apply(v, x, train=False)
        )(variables, pts)
    for head in ("classification_output", "segmentation_output"):
        a = np.asarray(outs["reference"][head], np.float32)
        b = np.asarray(outs["factored"][head], np.float32)
        # bf16 trunk on a shared exact-kNN graph: the only difference is
        # how the factoring redistributes rounding (measured 7.4e-4 on v5e)
        check(f"dgcnn factored {head} max |d|",
              float(np.max(np.abs(a - b))), 5e-3, "abs")


def main() -> int:
    print(f"backend: {jax.default_backend()}; devices: {jax.devices()}",
          flush=True)
    for fn in (
        check_voxel_centroids,
        check_normals,
        check_rigid_alignment,
        check_fps_selection,
        check_inference_precision_drift,
        check_onehot_gather,
        check_gather_maxmin_kernel,
        check_dgcnn_factored_edge,
        check_shardmap_pipeline,
        check_pooled_chain_training,
        check_shardmap_training,
    ):
        try:
            fn()
        except Exception as e:  # a crashed check is a failure, not a skip
            print(f"[FAIL] {fn.__name__} crashed: {type(e).__name__}: {e}",
                  flush=True)
            _FAILURES.append(fn.__name__)
    if _FAILURES:
        print(f"FAILED: {', '.join(_FAILURES)}", flush=True)
        return 1
    print("ALL CHECKS PASSED", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

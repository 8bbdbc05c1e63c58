"""Worker process for the multi-host (DCN) smoke test.

Spawned twice by test_multihost.py under JAX_PLATFORMS=cpu with 2 virtual
devices per process: joins a 2-process gloo-backed ``jax.distributed`` job
via :func:`initialize_multihost`, builds the global 4-device 'data' mesh,
feeds its process-local half of a deterministic toy batch through
:func:`make_global_batch`, and runs ONE real data-parallel train step
(gradient all-reduce inserted by GSPMD, riding the gloo cross-process
transport). Prints ``LOSS <value>`` for the parent to compare across
processes and against a single-process reference step.

Validates docs/SCALING.md steps 1-2 by execution (the reference has no
multi-host story at all — this is north-star headroom surface).

Usage: python dcn_worker.py <process_id> <coordinator_port>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from pointcloudprocessing_tpu.parallel.mesh import (
    data_parallel_mesh,
    initialize_multihost,
    make_global_batch,
    replicate_from_local,
)


def toy_problem(B, N, C):
    import numpy as np

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, N, 3)).astype(np.float32)
    cls = rng.integers(0, C, B).astype(np.int32)
    x[:, :, 0] += cls[:, None] * 4.0
    parts = (x[:, :, 2] > 0).astype(np.int32)
    se3 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    targets = {
        "classification_output": cls,
        "segmentation_output": parts,
        "se3": se3,
    }
    return x, targets


def main() -> None:
    proc = int(sys.argv[1])
    port = sys.argv[2]

    n_global = initialize_multihost(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc
    )
    assert n_global == 4, f"expected 4 global devices, got {n_global}"
    assert jax.process_index() == proc
    assert len(jax.local_devices()) == 2

    import numpy as np

    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.models import FreezeFlags, PointNet
    from pointcloudprocessing_tpu.train import steps as steps_lib

    B, N, C, P = 8, 32, 4, 3
    model = PointNet(num_classes=C, num_parts=P)
    freeze = FreezeFlags()
    # same seed on every process -> identical local state, then replicated
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, LearningConfig(rate=1e-3), freeze
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )

    mesh = data_parallel_mesh()  # 4 global devices, ('data',)
    state = replicate_from_local(state, mesh)

    x, targets = toy_problem(B, N, C)
    half = B // 2
    lo, hi = proc * half, (proc + 1) * half
    local = {"x": x[lo:hi], **{k: v[lo:hi] for k, v in targets.items()}}
    global_batch = make_global_batch(local, mesh, points_width=N)
    gx = global_batch.pop("x")

    state, logs = step(state, gx, global_batch, jax.random.key(7))
    loss = float(logs["loss"])
    # param checksum proves the all-reduced update is identical everywhere
    checksum = float(
        sum(float(abs(np.asarray(p)).sum()) for p in jax.tree.leaves(state.params))
    )
    print(f"LOSS {loss:.10f}", flush=True)
    print(f"CHECKSUM {checksum:.6f}", flush=True)

    # second leg: the shard_map DP mode over the SAME multi-process mesh —
    # its explicit pmean/psum collectives ride the gloo DCN transport
    # (per-shard programs; the mode that keeps the Pallas kernels on TPU)
    from jax.sharding import NamedSharding, PartitionSpec as SMP

    sm = steps_lib.make_shardmap_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0), mesh
    )
    expand = jax.jit(
        lambda a: a[None],
        out_shardings=NamedSharding(mesh, SMP(None, "data")),
    )
    xs = expand(gx)
    ts = {k: expand(v) for k, v in global_batch.items()}
    state, logs2 = sm(state, xs, ts, jax.random.key(9))
    print(f"SMLOSS {float(np.asarray(logs2['loss'])[0]):.10f}", flush=True)


if __name__ == "__main__":
    main()

"""Multi-host (DCN) smoke test: 2-process ``jax.distributed`` CPU job.

Spawns two worker subprocesses (tests/dcn_worker.py) that join a gloo-backed
coordinator, build the global 4-device mesh through
``parallel.mesh.initialize_multihost`` / ``data_parallel_mesh``, assemble a
global batch from process-local halves (``make_global_batch``), and run one
real data-parallel train step. Asserts both processes see the identical
loss and post-step parameter checksum (the gradient all-reduce crossed the
process boundary), and that the loss matches a single-process reference
step on the same global batch.

The reference has no multi-host capability (SURVEY.md §2.4) — this validates
docs/SCALING.md steps 1-2 by code rather than prose.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the container's sitecustomize force-registers the axon TPU plugin
    # whenever this var is set, overriding jax_platforms
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = f"{flags} --xla_force_host_platform_device_count=2".strip()
    env["PYTHONPATH"] = (
        os.path.dirname(HERE) + os.pathsep + env.get("PYTHONPATH", "")
    )
    return env


@pytest.mark.slow
def test_two_process_train_step():
    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dcn_worker.py"), str(i), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    def grab(out, tag):
        for line in out.splitlines():
            if line.startswith(tag + " "):
                return float(line.split()[1])
        raise AssertionError(f"{tag} not found in worker output:\n{out}")

    losses = [grab(o, "LOSS") for o in outs]
    checksums = [grab(o, "CHECKSUM") for o in outs]
    assert losses[0] == losses[1]
    assert checksums[0] == checksums[1]
    # shard_map DP leg: per-shard programs whose pmean/psum collectives
    # rode the same gloo DCN transport; both processes must report the
    # identical global loss
    sm_losses = [grab(o, "SMLOSS") for o in outs]
    assert sm_losses[0] == sm_losses[1]
    import math
    assert math.isfinite(sm_losses[0])

    # single-process reference on the same global batch
    import jax

    from dcn_worker import toy_problem
    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.models import FreezeFlags, PointNet
    from pointcloudprocessing_tpu.train import steps as steps_lib

    B, N, C, P = 8, 32, 4, 3
    model = PointNet(num_classes=C, num_parts=P)
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, LearningConfig(rate=1e-3), freeze
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )
    x, targets = toy_problem(B, N, C)
    import jax.numpy as jnp

    targets = {k: jnp.asarray(v) for k, v in targets.items()}
    _, logs = step(state, jnp.asarray(x), targets, jax.random.key(7))
    assert losses[0] == pytest.approx(float(logs["loss"]), rel=1e-4)

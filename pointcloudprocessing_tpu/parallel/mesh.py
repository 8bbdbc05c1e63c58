"""Device-mesh utilities: pjit data parallelism over ICI.

The reference is single-GPU (SURVEY §2.4 — no tf.distribute anywhere); the
TPU build scales the one axis this workload has, the batch, across a 1-D
``data`` mesh. Parameters and optimizer state are replicated; the batch is
sharded on axis 0; XLA inserts the gradient all-reduce over ICI. No
user-visible communication backend is needed — collectives are
compiler-inserted from the sharding annotations (pjit/GSPMD).

For very wide clouds there is also a ``points`` axis helper: the shared MLPs
are pointwise so sharding N is embarrassingly parallel, and the global
max-pool becomes a cross-shard ``max`` reduction XLA lowers to an
all-reduce(max) — the honest analogue of sequence parallelism for this
architecture (no attention, no ring pass needed).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None, points_axis: int = 1) -> Mesh:
    """1-D (or 2-D data x points) mesh over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if points_axis > 1:
        if n % points_axis:
            raise ValueError(f"{n} devices not divisible by points_axis={points_axis}")
        arr = np.array(devices).reshape(n // points_axis, points_axis)
        return Mesh(arr, ("data", "points"))
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded on axis 0 over 'data' (and points over axis 1
    when the mesh has a points axis)."""
    if "points" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "points"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(state, mesh: Mesh):
    """Replicate a TrainState (params/opt state/batch stats) over the mesh."""
    return jax.device_put(state, replicated_sharding(mesh))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the batch axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)

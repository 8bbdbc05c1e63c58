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


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Join a multi-host (DCN) job before building meshes.

    Single-host multi-chip needs nothing — ``jax.devices()`` already lists
    every chip and collectives ride ICI. Across hosts, call this once at
    program start (before any jax computation): it wraps
    ``jax.distributed.initialize``, after which ``jax.devices()`` is global
    and the same :func:`data_parallel_mesh` / ``shard_*`` code scales
    unchanged — GSPMD routes intra-host collectives over ICI and inter-host
    legs over DCN. On TPU pods the coordinator/process arguments are
    auto-detected from the environment; pass them explicitly elsewhere.

    Returns the global device count. See docs/SCALING.md for the full
    recipe and the data-loading contract (each process feeds only its
    addressable shard of the batch).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return len(jax.devices())


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


def batch_sharding(mesh: Mesh, points_dim_size: int | None = None) -> NamedSharding:
    """Sharding for the (b, n, 3) point tensor: batch over 'data', and the
    point axis over 'points' when the mesh has one.

    NOTE: only valid for rank>=2 arrays whose axis 1 is the point axis —
    use :func:`shard_batch` for a whole batch pytree (labels are rank 1 and
    se3's axis 1 is the 3x3 rotation, neither of which may shard on
    'points')."""
    if "points" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "points"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(state, mesh: Mesh):
    """Replicate a TrainState (params/opt state/batch stats) over the mesh."""
    return jax.device_put(state, replicated_sharding(mesh))


def shard_batch(batch, mesh: Mesh, points_width: int | None = None):
    """Place a host batch pytree on the mesh: every leaf's axis 0 over
    'data'; additionally axis 1 over 'points' for leaves whose axis 1 is the
    point axis (identified by ``points_width``, e.g. the network input
    width). Rank-1 leaves and se3 stay data-sharded only."""
    data_only = NamedSharding(mesh, P("data"))
    has_points = "points" in mesh.axis_names
    data_points = (
        NamedSharding(mesh, P("data", "points")) if has_points else data_only
    )

    def put(x):
        if (
            has_points
            and points_width is not None
            and getattr(x, "ndim", 0) >= 2
            and x.shape[1] == points_width
        ):
            return jax.device_put(x, data_points)
        return jax.device_put(x, data_only)

    return jax.tree_util.tree_map(put, batch)


def make_global_batch(local_batch, mesh: Mesh, points_width: int | None = None):
    """Multi-host analogue of :func:`shard_batch` (docs/SCALING.md step 2):
    each process passes only its addressable slice of the global batch
    (axis 0 = this host's share of the 'data' axis), and
    ``jax.make_array_from_process_local_data`` assembles the global arrays
    over the full mesh. On a single-process mesh this is equivalent to
    :func:`shard_batch`."""
    data_only = NamedSharding(mesh, P("data"))
    has_points = "points" in mesh.axis_names
    data_points = (
        NamedSharding(mesh, P("data", "points")) if has_points else data_only
    )

    def put(x):
        x = np.asarray(x)
        if (
            has_points
            and points_width is not None
            and x.ndim >= 2
            and x.shape[1] == points_width
        ):
            return jax.make_array_from_process_local_data(data_points, x)
        return jax.make_array_from_process_local_data(data_only, x)

    return jax.tree_util.tree_map(put, local_batch)


def replicate_from_local(tree, mesh: Mesh):
    """Multi-host analogue of :func:`shard_train_state`: every process holds
    the full value (e.g. a TrainState built from the same seed) and the
    result is replicated over the global mesh."""
    rep = replicated_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)

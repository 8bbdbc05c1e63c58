"""End-to-end serving pipeline: raw scans -> preprocess -> PointNet.

The north-star serving configuration (BASELINE.json config 5): batched LiDAR
scans stream host->HBM with double-buffered prefetch, and voxel downsample ->
FPS -> (optional normals) -> PointNet compile into ONE XLA program per batch.

Usage::

    pipe = PointCloudPipeline(model, variables, scan_width=2048,
                              model_width=1024, voxel_size=0.4)
    for outputs in pipe.stream(scan_batches):   # iterator of (b, n, 3)
        ...

The reference has no serving path at all (inference happens inside notebook
evaluate calls); this module is the deployment surface.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointcloudprocessing_tpu.models.pointnet import PointNet
from pointcloudprocessing_tpu.ops.fps import (
    farthest_point_sample_and_gather,
    stride_sample_and_gather,
)
from pointcloudprocessing_tpu.ops.voxel import voxel_downsample_batch


class PointCloudPipeline:
    def __init__(
        self,
        model: PointNet,
        variables: dict,
        scan_width: int,
        model_width: int,
        voxel_size: float | None = None,
        use_fps: bool = True,
        sampler: str | None = None,
        heads: tuple[str, ...] = (
            "classification_output", "segmentation_output", "se3",
        ),
        mesh: Mesh | None = None,
    ):
        """Args:
        scan_width: fixed input scan size (pad/truncate host-side).
        model_width: points fed to the network (<= scan_width).
        voxel_size: optional voxel downsample edge before sampling.
        use_fps: farthest-point sampling to model_width (False = head
          truncation of the voxel output — much faster, less uniform).
        sampler: overrides ``use_fps`` when given: "fps" (exact), "stride"
          (O(n) Morton-stride stratified sampling over the voxel output —
          ops/fps.py, serving-grade spread without the serial loop), or
          "head" (truncation).
        heads: model outputs to compute; dropping "segmentation_output"
          skips ~80% of the network's FLOPs for classification-only serving.
        mesh: optional device mesh with a "data" axis for data-parallel
          serving: each device runs the WHOLE fused program (preprocess +
          model, including the Pallas kernels) on its batch shard via
          shard_map — no collectives are needed at inference, so scaling
          is embarrassing over ICI. Batch size must divide by the mesh's
          data-axis size. Parameters are used replicated.
        """
        self.scan_width = scan_width
        self.model_width = model_width
        self.mesh = mesh

        if sampler is None:
            sampler = "fps" if use_fps else "head"
        if sampler not in ("fps", "stride", "head"):
            raise ValueError(f"Unknown sampler {sampler!r}")
        if sampler == "stride" and voxel_size is None:
            raise ValueError(
                "sampler='stride' needs the Morton-ordered voxel output; "
                "set voxel_size"
            )
        # FPS from an unmasked full-width scan to the same width is an
        # expensive identity permutation (PointNet is permutation-invariant)
        if voxel_size is None and model_width == scan_width and sampler == "fps":
            sampler = "head"
        self.sampler = sampler

        def run(points):
            mask = None
            # plane-major (b, 3, n) between the voxel and FPS kernels: both
            # consume coordinate planes, so the points-major interface's
            # interleave/split relayout copies vanish (docs/PERF.md round 3);
            # the sampled (b, k, 3) output stays points-major for the model
            layout = "bcn" if (voxel_size is not None and sampler == "fps") \
                else "bnc"
            if voxel_size is not None:
                points, mask = voxel_downsample_batch(
                    points, voxel_size, layout=layout
                )
            if sampler == "fps":
                # fused sample+gather: on TPU the Pallas FPS kernel emits the
                # selected coordinates directly (a take_along_axis gather
                # costs more than the sampling itself)
                _, sampled = farthest_point_sample_and_gather(
                    points, model_width, mask, layout=layout
                )
            elif sampler == "stride":
                _, sampled = stride_sample_and_gather(points, model_width, mask)
            else:
                sampled = points[:, :model_width]
            return model.apply(variables, sampled, train=False, heads=tuple(heads))

        self.heads = tuple(heads)
        if mesh is None:
            self._run = jax.jit(run)
            self._in_sharding = None
        else:
            # shard_map (not bare jit-with-shardings): the program contains
            # Pallas custom calls, which GSPMD cannot partition — per-shard
            # execution sidesteps that and is exactly the serving semantics
            self._run = jax.jit(
                jax.shard_map(
                    run, mesh=mesh,
                    in_specs=P("data"), out_specs=P("data"),
                    check_vma=False,
                )
            )
            self._in_sharding = NamedSharding(mesh, P("data"))

    def __call__(self, scans) -> dict[str, jnp.ndarray]:
        """One batch: (b, scan_width, 3) -> model outputs."""
        scans = jnp.asarray(scans, dtype=jnp.float32)
        if scans.shape[1] != self.scan_width:
            raise ValueError(
                f"Expected scans of width {self.scan_width}, got {scans.shape[1]}"
            )
        if self._in_sharding is not None:
            scans = jax.device_put(scans, self._in_sharding)
        return self._run(scans)

    def stream(
        self,
        batches: Iterable[np.ndarray],
        prefetch: int = 2,
    ) -> Iterator[dict[str, jnp.ndarray]]:
        """Pipelined inference: a background thread stages host batches onto
        the device (double-buffered) while the current batch computes."""
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # the sentinel must reach the consumer even if the source
            # iterator raises — otherwise q.get() blocks forever
            try:
                for batch in batches:
                    staged = jax.device_put(
                        np.asarray(batch, dtype=np.float32), self._in_sharding
                    )
                    if not _put(staged):
                        return
            finally:
                _put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                staged = q.get()
                if staged is None:
                    return
                yield self._run(staged)
        finally:
            stop.set()
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    thread.join(timeout=0.2)

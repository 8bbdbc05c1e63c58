"""pointcloudprocessing_tpu — a TPU-native point-cloud learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MAPieschl/PointCloudProcessing (TensorFlow/CUDA reference):

- ``models``:   PointNet family (multi-head classification + segmentation +
                SE(3) regression) as jit-compiled Flax modules.
- ``ops``:      point-cloud numerics — normalization, resampling, jitter,
                voxel downsampling, FPS, kNN, PCA normals, hidden-point
                removal, SO(3)/SE(3) math — as XLA-fusable jnp + Pallas ops.
- ``data``:     TFRecord-byte-compatible dataset pipeline (AftrBurner frame
                ingest, train/val/test splits, double-buffered host->HBM
                prefetch).
- ``train``:    staged/curriculum training driver (JSON-config compatible
                with the reference's ``*_config.json`` schema).
- ``parallel``: device-mesh sharding utilities (pjit data parallelism over
                ICI, point-axis sharding for very wide clouds).
- ``export``:   StableHLO / TF-SavedModel export replacing tf2onnx.
- ``toolkit``:  sensor utilities (Provizio radar MCAP, OptiTrack logs,
                Kabsch extrinsics, corner-reflector ray tracing) with the
                same public API as the reference's point_cloud_toolkit.
"""

__version__ = "0.1.0"

"""Model export: StableHLO (jax.export) and TF SavedModel (jax2tf).

Replaces the reference's tf2onnx path (pointnet_train.py:237-248): instead of
Keras -> ONNX opset 13, the jitted inference function is serialized as a
portable StableHLO artifact (loadable from any jax install via
jax.export.deserialize) and, when TensorFlow is present, a TF SavedModel for
serving stacks that consume TF graphs. Output signature matches the
reference's ONNX graph: cls (-1, C), seg (-1, n, P), se3 (-1, 3, 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudprocessing_tpu.models.pointnet import PointNet


def make_inference_fn(model: PointNet, variables):
    """Closure producing the reference's output tuple [cls, seg, se3]."""

    def infer(points):
        out = model.apply(variables, points, train=False)
        return (
            out["classification_output"],
            out["segmentation_output"],
            out["se3"],
        )

    return infer


def export_stablehlo(model: PointNet, variables, input_width: int, path: str,
                     batch_size: int | None = None) -> bytes:
    """Serialize the inference fn to a StableHLO artifact at ``path``.

    ``batch_size=None`` exports with a symbolic batch dimension (the
    reference ONNX graph's -1 batch).
    """
    from jax import export as jax_export

    infer = make_inference_fn(model, variables)
    if batch_size is None:
        (batch,) = jax_export.symbolic_shape("b")
    else:
        batch = batch_size
    spec = jax.ShapeDtypeStruct((batch, input_width, 3), jnp.float32)
    # export for every mainstream backend: without `platforms` the
    # artifact locks to the EXPORTING platform (tpu under the training
    # driver) and a cpu/gpu deployment's call() dies with a platform
    # mismatch — the portability this module exists for
    exported = jax_export.export(
        jax.jit(infer), platforms=("cpu", "tpu", "cuda")
    )(spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return blob


def load_stablehlo(path: str):
    """Deserialize an exported artifact; returns the jax-callable export."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def export_tf_savedmodel(model: PointNet, variables, input_width: int, path: str) -> bool:
    """TF SavedModel via jax2tf (serving interop). Returns False when TF is
    unavailable."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError:
        return False

    infer = make_inference_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(infer, polymorphic_shapes=["(b, _, _)"]),
        input_signature=[
            tf.TensorSpec((None, input_width, 3), tf.float32, name="pointnet_input")
        ],
        autograph=False,
    )
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, path)
    return True


def export_pointnet(model: PointNet, variables, input_width: int, path_prefix: str) -> None:
    """Stage-artifact export used by the training driver."""
    export_stablehlo(model, variables, input_width, f"{path_prefix}.stablehlo")

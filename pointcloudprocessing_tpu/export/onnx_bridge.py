"""ONNX export bridge (gated on tf2onnx availability).

The reference exports opset-13 ONNX straight from Keras
(pointnet_train.py:237-248) and verifies it with onnxruntime
(examples/pointnet_train.ipynb cells 15-18). The TPU-native stack's primary
interchange formats are StableHLO and TF SavedModel (export/stablehlo.py);
for consumers that require ONNX, this module bridges
jax -> jax2tf -> tf2onnx when those packages are installed, and degrades
with a clear advisory otherwise.
"""

from __future__ import annotations

from typing import Callable

from pointcloudprocessing_tpu.export.stablehlo import make_inference_fn
from pointcloudprocessing_tpu.models.pointnet import PointNet

GATING_MESSAGE = (
    "ONNX toolchain (tf2onnx/onnx) not installed — exporting with the "
    "native opset-13 writer (export/onnx_native.py) instead; the artifact "
    "is verified in-image by its bundled numpy interpreter, and "
    "onnxruntime re-inference applies wherever the file is consumed."
)


def onnx_available() -> bool:
    try:
        import tensorflow  # noqa: F401
        import tf2onnx  # noqa: F401
        import onnx  # noqa: F401
    except ImportError:
        return False
    return True


def export_onnx(
    model: PointNet,
    variables,
    input_width: int,
    path: str,
    opset: int = 13,
    print_func: Callable[[str], None] = print,
) -> bool:
    """Export the inference function as an ONNX model (reference parity:
    opset 13, outputs cls (-1, C), seg (-1, n, P), se3 (-1, 3, 3)).

    Returns True on success. Without the optional toolchain the NATIVE
    exporter (export/onnx_native.py — hand-rolled opset-13 protobuf
    writer, numerically verified against model.apply by its bundled numpy
    interpreter in test_onnx_native.py) produces the artifact instead.
    """
    if not onnx_available():
        from pointcloudprocessing_tpu.models.dgcnn import DGCNN
        from pointcloudprocessing_tpu.models.pointnet2 import PointNet2
        from pointcloudprocessing_tpu.export import onnx_native

        if isinstance(model, PointNet):
            emit = onnx_native.export_onnx_native
        elif isinstance(model, PointNet2):
            emit = onnx_native.export_onnx_native_pointnet2
        elif isinstance(model, DGCNN):
            emit = onnx_native.export_onnx_native_dgcnn
        else:
            print_func(
                f"ONNX export for {type(model).__name__} needs the "
                "tf2onnx/onnx toolchain (the native opset-13 writer covers "
                "the PointNet/PointNet2/DGCNN families); StableHLO remains "
                "the portable artifact for this model."
            )
            return False
        print_func(GATING_MESSAGE)
        emit(model, variables, input_width, path,
             print_func=print_func, opset=opset)
        return True

    import tensorflow as tf
    import tf2onnx
    import onnx
    from jax.experimental import jax2tf

    infer = make_inference_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(infer, polymorphic_shapes=["(b, _, _)"]),
        input_signature=[
            tf.TensorSpec((None, input_width, 3), tf.float32, name="pointnet_input")
        ],
        autograph=False,
    )
    onnx_model, _ = tf2onnx.convert.from_function(
        tf_fn,
        input_signature=[
            tf.TensorSpec((None, input_width, 3), tf.float32, name="pointnet_input")
        ],
        opset=opset,
    )
    onnx.save(onnx_model, path)
    return True


def verify_onnx(path: str, points, print_func: Callable[[str], None] = print):
    """Re-run an exported ONNX model (the notebook's parity check,
    pointnet_train.ipynb cells 15-18): through onnxruntime when installed,
    otherwise through the native numpy interpreter
    (export/onnx_native.py::run_onnx — executes the opset-13 subset the
    native exporter emits). Returns the output list, or None if neither
    engine can run the file."""
    import numpy as np

    try:
        import onnxruntime as ort
    except ImportError:
        from pointcloudprocessing_tpu.export.onnx_native import (
            parse_model,
            run_onnx,
        )

        try:
            parsed = parse_model(open(path, "rb").read())
            out = run_onnx(parsed, {
                parsed["inputs"][0]: np.asarray(points, np.float32)
            })
        except Exception as e:  # missing file, foreign-producer encodings
            # (e.g. tf2onnx packed repeated fields), unimplemented ops —
            # degrade like the old no-onnxruntime path, never raise
            print_func(
                f"onnxruntime is not installed and the native interpreter "
                f"cannot execute this file ({type(e).__name__}: {e}); "
                f"skipping the ONNX re-inference check."
            )
            return None
        print_func(
            "onnxruntime is not installed; re-inferred through the native "
            "numpy interpreter instead."
        )
        return [out[name] for name in parsed["outputs"]]
    session = ort.InferenceSession(path)
    input_name = session.get_inputs()[0].name
    return session.run(None, {input_name: np.asarray(points, np.float32)})

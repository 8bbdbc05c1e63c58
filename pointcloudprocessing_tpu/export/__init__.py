from pointcloudprocessing_tpu.export.keras_compat import (
    flax_variables_from_keras_pointnet,
)
from pointcloudprocessing_tpu.export.stablehlo import (
    export_stablehlo,
    load_stablehlo,
    export_tf_savedmodel,
)
from pointcloudprocessing_tpu.export.onnx_bridge import (
    export_onnx,
    onnx_available,
    verify_onnx,
)

__all__ = [
    "flax_variables_from_keras_pointnet",
    "export_stablehlo",
    "load_stablehlo",
    "export_tf_savedmodel",
    "export_onnx",
    "onnx_available",
    "verify_onnx",
]

from pointcloudprocessing_tpu.export.keras_compat import (
    flax_variables_from_keras_pointnet,
)

__all__ = ["flax_variables_from_keras_pointnet"]

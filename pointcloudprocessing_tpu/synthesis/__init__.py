from pointcloudprocessing_tpu.synthesis.mesh import (
    Mesh,
    load_obj,
    sample_points_uniformly,
)
from pointcloudprocessing_tpu.synthesis.meshsampler import MeshSampler, pad_observation

__all__ = [
    "Mesh",
    "load_obj",
    "sample_points_uniformly",
    "MeshSampler",
    "pad_observation",
]

from pointcloudprocessing_tpu.synthesis.mesh import (
    Mesh,
    load_obj,
    sample_points_uniformly,
)
from pointcloudprocessing_tpu.synthesis.meshsampler import MeshSampler, pad_observation
from pointcloudprocessing_tpu.synthesis.collect import (
    dominant_axis_parts,
    write_collect,
)
from pointcloudprocessing_tpu.synthesis.procedural import (
    aircraft_like_mesh,
    box_mesh,
    compound_mesh,
    octahedron_mesh,
    shape_library,
)

__all__ = [
    "Mesh",
    "load_obj",
    "sample_points_uniformly",
    "MeshSampler",
    "pad_observation",
    "write_collect",
    "dominant_axis_parts",
    "box_mesh",
    "octahedron_mesh",
    "compound_mesh",
    "aircraft_like_mesh",
    "shape_library",
]

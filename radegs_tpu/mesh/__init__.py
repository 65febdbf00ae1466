from radegs_tpu.mesh.culling import (
    cull_mesh,
    keep_largest_component,
    mesh_depth_map,
    point_visibility,
    post_process_mesh,
)
from radegs_tpu.mesh.tetmesh import marching_tetrahedra
from radegs_tpu.mesh.unbounded import extract_mesh_unbounded

__all__ = [
    "marching_tetrahedra",
    "cull_mesh",
    "keep_largest_component",
    "mesh_depth_map",
    "point_visibility",
    "post_process_mesh",
    "extract_mesh_unbounded",
]

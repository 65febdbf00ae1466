from radegs_tpu.mesh.tetmesh import marching_tetrahedra

__all__ = ["marching_tetrahedra"]

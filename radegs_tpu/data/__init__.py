from radegs_tpu.data.readers import (
    CameraInfo,
    SceneInfo,
    load_scene_info,
    read_blender_scene,
    read_colmap_scene,
)
from radegs_tpu.data.scene import Scene

__all__ = [
    "CameraInfo",
    "SceneInfo",
    "Scene",
    "load_scene_info",
    "read_colmap_scene",
    "read_blender_scene",
]

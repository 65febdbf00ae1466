"""Dataset readers: COLMAP and Blender/NeRF-synthetic scenes.

Reproduces the behavior of scene/dataset_readers.py (readColmapSceneInfo
:191-243, readNerfSyntheticInfo :287-322, getNerfppNorm :51-72) and
utils/camera_utils.py (loadCam resolution policy :20-61) on the host in
NumPy/PIL; device arrays are produced later by data.scene.Scene.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

import numpy as np

from radegs_tpu.core.camera import focal2fov, fov2focal
from radegs_tpu.data import colmap
from radegs_tpu.utils import ply as plyio


@dataclass
class CameraInfo:
    uid: int
    R: np.ndarray  # (3,3) c2w rotation
    T: np.ndarray  # (3,) w2c translation
    fovx: float
    fovy: float
    image_path: str
    image_name: str
    width: int
    height: int
    # lazily-loaded pixel data; populated by load_image()
    image: np.ndarray | None = None  # (H,W,3) float32 in [0,1]
    mask: np.ndarray | None = None  # (H,W) float32 alpha or None
    bg: tuple = (0.0, 0.0, 0.0)

    def load_image(self, resolution_scale: float = 1.0, resolution: int = -1):
        """PIL load + the reference resolution policy (camera_utils.py:20-61):
        -1 = auto-downscale so width <= 1600; k>0 = divide by k."""
        from PIL import Image

        img = Image.open(self.image_path)
        orig_w, orig_h = img.size
        if resolution in (-1, 0):
            if orig_w / resolution_scale > 1600:
                scale = (orig_w / resolution_scale) / 1600
            else:
                scale = 1.0
            scale *= resolution_scale
        else:
            scale = float(resolution) * resolution_scale
        size = (round(orig_w / scale), round(orig_h / scale))
        img = img.resize(size, Image.LANCZOS)
        arr = np.asarray(img).astype(np.float32) / 255.0
        mask = None
        if arr.ndim == 3 and arr.shape[2] == 4:
            mask = arr[..., 3]
            arr = arr[..., :3] * mask[..., None] + np.asarray(self.bg) * (
                1.0 - mask[..., None]
            )
        elif arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=2)
        self.image = np.clip(arr, 0.0, 1.0)
        self.mask = mask
        self.width, self.height = size
        return self


@dataclass
class SceneInfo:
    point_cloud: tuple  # (xyz (N,3), rgb (N,3) in [0,1])
    train_cameras: list
    test_cameras: list
    nerf_normalization: dict  # {"translate": (3,), "radius": float}
    ply_path: str
    is_blender: bool = False


def get_nerfpp_norm(cam_infos):
    """Scene extent from camera centers (dataset_readers.py:51-72)."""
    centers = []
    for c in cam_infos:
        # camera center = -R @ T with R the c2w rotation
        centers.append(-(c.R @ c.T))
    centers = np.stack(centers)  # (N,3)
    avg = centers.mean(axis=0)
    dists = np.linalg.norm(centers - avg, axis=1)
    diagonal = float(dists.max())
    radius = diagonal * 1.1
    return {"translate": -avg, "radius": radius}


def read_colmap_scene(path, images_dir="images", eval_split=False, llffhold=8) -> SceneInfo:
    """readColmapSceneInfo (dataset_readers.py:191-243)."""
    sparse = os.path.join(path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    try:
        cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        imgs = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    except FileNotFoundError:
        cams = colmap.read_cameras_text(os.path.join(sparse, "cameras.txt"))
        imgs = colmap.read_images_text(os.path.join(sparse, "images.txt"))

    cam_infos = []
    for iid, im in sorted(imgs.items(), key=lambda kv: kv[1].name):
        cam = cams[im.camera_id]
        fx, fy = colmap.camera_intrinsics(cam)
        R = colmap.qvec2rotmat(im.qvec).T  # c2w
        cam_infos.append(
            CameraInfo(
                uid=iid,
                R=R,
                T=im.tvec.copy(),
                fovx=focal2fov(fx, cam.width),
                fovy=focal2fov(fy, cam.height),
                image_path=os.path.join(path, images_dir, im.name),
                image_name=os.path.splitext(im.name)[0],
                width=cam.width,
                height=cam.height,
            )
        )

    if eval_split:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []

    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = colmap.read_points3d_text(os.path.join(sparse, "points3D.txt"))
        store_points_ply(ply_path, xyz, rgb)
    xyz, rgb = fetch_points_ply(ply_path)
    return SceneInfo((xyz, rgb), train, test, norm, ply_path)


def read_blender_scene(path, white_background=False, eval_split=True, n_init=100_000,
                       seed=0) -> SceneInfo:
    """readNerfSyntheticInfo (dataset_readers.py:287-322)."""
    bg = (1.0, 1.0, 1.0) if white_background else (0.0, 0.0, 0.0)

    def read_split(fname):
        with open(os.path.join(path, fname)) as f:
            meta = json.load(f)
        fovx = meta["camera_angle_x"]
        infos = []
        for i, frame in enumerate(meta["frames"]):
            img_path = os.path.join(path, frame["file_path"] + ".png")
            c2w = np.array(frame["transform_matrix"])
            c2w[:3, 1:3] *= -1  # Blender/OpenGL -> COLMAP/OpenCV camera axes
            w2c = np.linalg.inv(c2w)
            R = w2c[:3, :3].T
            T = w2c[:3, 3]
            from PIL import Image

            with Image.open(img_path) as im:
                W, H = im.size
            fovy = focal2fov(fov2focal(fovx, W), H)
            infos.append(
                CameraInfo(
                    uid=i, R=R, T=T, fovx=fovx, fovy=fovy, image_path=img_path,
                    image_name=os.path.basename(frame["file_path"]),
                    width=W, height=H, bg=bg,
                )
            )
        return infos

    train = read_split("transforms_train.json")
    test = (
        read_split("transforms_test.json")
        if eval_split and os.path.exists(os.path.join(path, "transforms_test.json"))
        else []
    )
    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        rng = np.random.default_rng(seed)
        xyz = (rng.random((n_init, 3)) * 2.6 - 1.3).astype(np.float32)
        rgb = rng.random((n_init, 3)).astype(np.float32)
        store_points_ply(ply_path, xyz, (rgb * 255).astype(np.uint8))
    xyz, rgb = fetch_points_ply(ply_path)
    return SceneInfo((xyz, rgb), train, test, norm, ply_path, is_blender=True)


def load_scene_info(path, **kw) -> SceneInfo:
    """Autodetect dataset type (scene/__init__.py:43-47)."""
    if os.path.exists(os.path.join(path, "sparse")):
        kw.pop("white_background", None)
        return read_colmap_scene(path, **kw)
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        kw.pop("images_dir", None)
        kw.pop("llffhold", None)
        return read_blender_scene(path, **kw)
    raise ValueError(f"Could not recognize scene type at {path}")


def store_points_ply(path, xyz, rgb):
    """dataset_readers.py:169-189 storePly (normals written as zeros)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = xyz.shape[0]
    arr = np.zeros(
        n,
        dtype=[(k, "f4") for k in ("x", "y", "z", "nx", "ny", "nz")]
        + [(k, "u1") for k in ("red", "green", "blue")],
    )
    for i, k in enumerate(("x", "y", "z")):
        arr[k] = xyz[:, i]
    for i, k in enumerate(("red", "green", "blue")):
        arr[k] = rgb[:, i]
    plyio.write_ply(path, {"vertex": arr})


def fetch_points_ply(path):
    """dataset_readers.py:156-167 fetchPly -> (xyz, rgb in [0,1])."""
    v = plyio.read_ply(path)["vertex"]
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    if "red" in v.dtype.names:
        rgb = np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.float32)
        if rgb.max() > 1.0:
            rgb /= 255.0
    else:
        rgb = np.full_like(xyz, 0.5)
    return xyz, rgb

"""COLMAP sparse-reconstruction parsers (binary and text).

Implements the public COLMAP file formats (colmap.github.io/format.html);
covers the same model set the reference consumes (scene/colmap_loader.py:
83-261): SIMPLE_PINHOLE / PINHOLE (plus SIMPLE_RADIAL treated as pinhole
with a warning, matching common 3DGS practice).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

# model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_NAME_TO_ID = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray  # (4,) wxyz
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str


def qvec2rotmat(q):
    """Quaternion (w,x,y,z) -> rotation matrix (colmap_loader.py:43)."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _read(f, n, fmt):
    return struct.unpack("<" + fmt, f.read(n))


def read_cameras_binary(path):
    cams = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            cid, model_id, w, h = _read(f, 24, "iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, 8 * n_params, "d" * n_params))
            cams[cid] = ColmapCamera(cid, name, int(w), int(h), params)
    return cams


def read_images_binary(path):
    native = _try_native()
    if native is not None:
        out = _read_images_native(native, path)
        if out is not None:
            return out
    return _read_images_binary_py(path)


def _read_images_binary_py(path):
    images = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            iid = _read(f, 4, "i")[0]
            qvec = np.array(_read(f, 32, "dddd"))
            tvec = np.array(_read(f, 24, "ddd"))
            (cam_id,) = _read(f, 4, "i")
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, 8, "Q")
            f.seek(24 * n_pts, os.SEEK_CUR)  # skip 2D points (x, y, id)
            images[iid] = ColmapImage(iid, qvec, tvec, cam_id, name.decode())
    return images


def read_points3d_binary(path):
    native = _try_native()
    if native is not None:
        out = _read_points3d_native(native, path)
        if out is not None:
            return out
    return _read_points3d_binary_py(path)


def _read_points3d_binary_py(path):
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        xyz = np.empty((num, 3))
        rgb = np.empty((num, 3), np.uint8)
        err = np.empty((num,))
        for i in range(num):
            data = _read(f, 43, "QdddBBBd")
            xyz[i] = data[1:4]
            rgb[i] = data[4:7]
            err[i] = data[7]
            (track_len,) = _read(f, 8, "Q")
            f.seek(8 * track_len, os.SEEK_CUR)
    return xyz, rgb, err


def _try_native():
    """The C++ mmap parsers (native/colmap_native.cpp) — the per-record
    Python struct loop takes minutes on multi-million-point scenes."""
    try:
        from radegs_tpu.native import load_native

        return load_native()
    except Exception:
        return None


def _read_points3d_native(lib, path):
    import ctypes

    n = lib.radegs_points3d_count(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    ids = np.empty((n,), np.int64)
    r = lib.radegs_points3d_fill(
        path.encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
    )
    if r != n:
        return None
    return xyz, rgb, err


def _read_images_native(lib, path, max_name=256):
    import ctypes

    n = lib.radegs_images_count(path.encode())
    if n < 0:
        return None
    ids = np.empty((n,), np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty((n,), np.int32)
    names = ctypes.create_string_buffer(n * max_name)
    r = lib.radegs_images_fill(
        path.encode(),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        names, max_name, n,
    )
    if r != n:
        return None
    images = {}
    for i in range(n):
        name = names.raw[i * max_name : (i + 1) * max_name].split(b"\x00")[0].decode()
        images[int(ids[i])] = ColmapImage(
            int(ids[i]), qvec[i].copy(), tvec[i].copy(), int(cam_ids[i]), name
        )
    return images


def read_cameras_text(path):
    cams = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cid = int(parts[0])
            cams[cid] = ColmapCamera(
                cid, parts[1], int(parts[2]), int(parts[3]),
                np.array([float(p) for p in parts[4:]]),
            )
    return cams


def read_images_text(path):
    images = {}
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    # images.txt alternates: pose line, then 2D-points line
    for line in lines[0::2]:
        parts = line.split()
        iid = int(parts[0])
        qvec = np.array([float(p) for p in parts[1:5]])
        tvec = np.array([float(p) for p in parts[5:8]])
        images[iid] = ColmapImage(iid, qvec, tvec, int(parts[8]), parts[9])
    return images


def read_points3d_text(path):
    xyz, rgb, err = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            xyz.append([float(p) for p in parts[1:4]])
            rgb.append([int(p) for p in parts[4:7]])
            err.append(float(parts[7]))
    return np.array(xyz), np.array(rgb, np.uint8), np.array(err)


def camera_intrinsics(cam: ColmapCamera):
    """(focal_x, focal_y) for supported models (dataset_readers.py:120-135)."""
    if cam.model == "SIMPLE_PINHOLE":
        return float(cam.params[0]), float(cam.params[0])
    if cam.model == "PINHOLE":
        return float(cam.params[0]), float(cam.params[1])
    if cam.model in ("SIMPLE_RADIAL", "RADIAL"):
        # tolerate undistorted-as-radial exports; treat as simple pinhole,
        # but warn when the distortion coefficients are non-negligible —
        # the reference refuses non-pinhole models (dataset_readers.py:120-135)
        import warnings

        k = [float(p) for p in cam.params[3:]]
        if any(abs(v) > 1e-6 for v in k):
            warnings.warn(
                f"COLMAP camera model {cam.model} has non-zero distortion "
                f"{k}; treating as pinhole WITHOUT undistortion — geometry "
                "will be wrong. Undistort the dataset first.",
                stacklevel=2,
            )
        return float(cam.params[0]), float(cam.params[0])
    raise ValueError(
        f"Unsupported COLMAP camera model {cam.model}: undistort the dataset "
        "first (the reference requires PINHOLE/SIMPLE_PINHOLE too)"
    )

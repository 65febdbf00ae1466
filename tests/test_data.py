"""Dataset readers: COLMAP binary/text round-trip and Blender scenes built
from synthetic fixtures on disk."""

import json
import os
import struct

import numpy as np
import pytest

from radegs_tpu.data import colmap
from radegs_tpu.data.readers import load_scene_info
from radegs_tpu.data.scene import Scene


def write_colmap_binary(sparse, cams, imgs, pts):
    os.makedirs(sparse, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cid, (model_id, w, h, params) in cams.items():
            f.write(struct.pack("<iiQQ", cid, model_id, w, h))
            f.write(struct.pack(f"<{len(params)}d", *params))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(imgs)))
        for iid, (q, t, cid, name) in imgs.items():
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", cid))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two dummy 2D points
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))
            f.write(struct.pack("<ddq", 3.0, 4.0, 7))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for pid, (xyz, rgb) in enumerate(pts):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", *rgb))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


@pytest.fixture
def colmap_scene(tmp_path):
    from PIL import Image

    root = tmp_path / "scene"
    sparse = root / "sparse" / "0"
    cams = {1: (1, 64, 48, [60.0, 60.0, 32.0, 24.0])}  # PINHOLE fx fy cx cy
    rng = np.random.default_rng(0)
    imgs = {}
    for i in range(4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        imgs[i + 1] = (q.tolist(), rng.normal(size=3).tolist(), 1, f"im_{i:03d}.png")
    pts = [(rng.normal(size=3).tolist(), rng.integers(0, 255, 3).tolist())
           for _ in range(50)]
    write_colmap_binary(str(sparse), cams, imgs, pts)
    os.makedirs(root / "images", exist_ok=True)
    for i in range(4):
        Image.fromarray(
            (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        ).save(root / "images" / f"im_{i:03d}.png")
    return str(root), imgs, pts


def test_colmap_binary_parsers(colmap_scene):
    root, imgs, pts = colmap_scene
    sparse = os.path.join(root, "sparse", "0")
    cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    rimgs = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(rimgs) == 4
    for iid, (q, t, cid, name) in imgs.items():
        np.testing.assert_allclose(rimgs[iid].qvec, q)
        np.testing.assert_allclose(rimgs[iid].tvec, t)
        assert rimgs[iid].name == name
    xyz, rgb, err = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    assert xyz.shape == (50, 3)
    np.testing.assert_allclose(xyz[0], pts[0][0])


def test_scene_load_colmap(colmap_scene):
    root, _, _ = colmap_scene
    scene = Scene(root, model_path=None, eval_split=False, shuffle=False)
    cams = scene.getTrainCameras()
    assert len(cams) == 4
    cam, gt, idx = cams[0]
    assert gt.shape == (3, 48, 64)
    assert cam.width == 64 and cam.height == 48
    assert scene.cameras_extent > 0
    g = scene.create_gaussians()
    assert int(g.n_active()) == 50


def test_blender_reader(tmp_path):
    from PIL import Image

    root = tmp_path / "lego"
    os.makedirs(root / "train", exist_ok=True)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(3):
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 3 + i]
        frames.append({"file_path": f"./train/r_{i}", "transform_matrix": c2w.tolist()})
        arr = (rng.random((32, 40, 4)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "train" / f"r_{i}.png")
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    info = load_scene_info(str(root), white_background=True)
    assert info.is_blender and len(info.train_cameras) == 3
    xyz, rgb = info.point_cloud
    assert xyz.shape[0] == 100_000  # random init (dataset_readers.py:300-310)
    scene = Scene(str(root), model_path=None, white_background=True, shuffle=False)
    cam, gt, _ = scene.getTrainCameras()[0]
    assert gt.shape == (3, 32, 40)
    assert cam.width == 40


def test_native_parser_matches_python(colmap_scene):
    from radegs_tpu.data.colmap import (
        _read_images_binary_py,
        _read_images_native,
        _read_points3d_binary_py,
        _read_points3d_native,
        _try_native,
    )

    lib = _try_native()
    assert lib is not None, "C++ toolchain present in this image; native must build"
    root, _, _ = colmap_scene
    sparse = os.path.join(root, "sparse", "0")

    xyz_n, rgb_n, err_n = _read_points3d_native(lib, os.path.join(sparse, "points3D.bin"))
    xyz_p, rgb_p, err_p = _read_points3d_binary_py(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_array_equal(xyz_n, xyz_p)
    np.testing.assert_array_equal(rgb_n, rgb_p)
    np.testing.assert_array_equal(err_n, err_p)

    im_n = _read_images_native(lib, os.path.join(sparse, "images.bin"))
    im_p = _read_images_binary_py(os.path.join(sparse, "images.bin"))
    assert set(im_n) == set(im_p)
    for k in im_p:
        np.testing.assert_allclose(im_n[k].qvec, im_p[k].qvec)
        np.testing.assert_allclose(im_n[k].tvec, im_p[k].tvec)
        assert im_n[k].name == im_p[k].name
        assert im_n[k].camera_id == im_p[k].camera_id

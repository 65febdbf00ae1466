"""LLFF prep toolchain (radegs_tpu/data/llff.py): COLMAP -> poses_bounds.npy
conversion math against hand-built models, and the PIL image pyramid."""

import os
import struct

import numpy as np
import pytest

from radegs_tpu.data.llff import (
    colmap_to_llff_poses,
    gen_poses,
    load_poses_bounds,
    minify_images,
    save_poses_bounds,
)
from tests.test_data import write_colmap_binary


def _write_points_with_tracks(sparse, pts, tracks):
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for pid, (xyz, track) in enumerate(zip(pts, tracks)):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", 128, 128, 128))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", len(track)))
            for iid in track:
                f.write(struct.pack("<ii", iid, 0))


@pytest.fixture
def llff_scene(tmp_path):
    root = tmp_path / "scene"
    sparse = root / "sparse" / "0"
    cams = {1: (1, 64, 48, [60.0, 60.0, 32.0, 24.0])}
    # 3 cameras at z = 0, -1, -2, identity rotation (looking +z in colmap)
    imgs = {i + 1: ([1.0, 0, 0, 0], [0.0, 0.0, float(i)], 1,
                    f"im_{i:03d}.png") for i in range(3)}
    write_colmap_binary(str(sparse), cams, imgs, [])
    # points at z = 4..8, all seen by all three views
    pts = [[0.1 * i, -0.1 * i, 4.0 + i] for i in range(5)]
    _write_points_with_tracks(str(sparse), pts, [[1, 2, 3]] * 5)
    return str(root)


def test_colmap_to_llff_poses(llff_scene):
    poses, pts3d, perm = colmap_to_llff_poses(llff_scene)
    assert poses.shape == (3, 5, 3)
    assert len(pts3d) == 5
    # hwf column
    np.testing.assert_allclose(poses[:, 4, 0], [48, 64, 60])
    # identity rotation, w2c t = (0,0,i) -> c2w position (0,0,-i); LLFF axis
    # order [-u, r, -t]: col0 = c2w y-axis, col1 = x-axis, col2 = -z-axis
    for i in range(3):
        np.testing.assert_allclose(poses[:, 3, i], [0, 0, -i], atol=1e-12)
        np.testing.assert_allclose(poses[:, 0, i], [0, 1, 0])
        np.testing.assert_allclose(poses[:, 1, i], [1, 0, 0])
        np.testing.assert_allclose(poses[:, 2, i], [0, 0, -1])


def test_save_and_load_poses_bounds(llff_scene):
    poses, pts3d, perm = colmap_to_llff_poses(llff_scene)
    arr = save_poses_bounds(llff_scene, poses, pts3d, perm)
    assert arr.shape == (3, 17)
    p2, bds = load_poses_bounds(llff_scene)
    np.testing.assert_allclose(p2, poses)
    # camera i sits at z = -i looking +z; point depths = 4+j+i
    for i in range(3):
        assert abs(bds[0, i] - (4.0 + i)) < 0.02  # near ~ closest point
        assert abs(bds[1, i] - (8.0 + i)) < 0.02  # far ~ farthest point


def test_gen_poses_requires_model(tmp_path):
    with pytest.raises(FileNotFoundError):
        gen_poses(str(tmp_path))


def test_gen_poses_and_minify(llff_scene):
    from PIL import Image

    imgdir = os.path.join(llff_scene, "images")
    os.makedirs(imgdir)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(os.path.join(imgdir, f"im_{i:03d}.png"))
    assert gen_poses(llff_scene, factors=[2])
    assert os.path.exists(os.path.join(llff_scene, "poses_bounds.npy"))
    down = os.path.join(llff_scene, "images_2")
    assert sorted(os.listdir(down)) == [f"im_{i:03d}.png" for i in range(3)]
    im = Image.open(os.path.join(down, "im_000.png"))
    assert (im.width, im.height) == (32, 24)

    minify_images(llff_scene, resolutions=[(12, 16)])  # (H, W)
    im = Image.open(os.path.join(llff_scene, "images_16x12", "im_000.png"))
    assert (im.width, im.height) == (16, 12)

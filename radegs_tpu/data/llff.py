"""LLFF dataset preparation — poses_bounds.npy from a COLMAP model.

Port of the reference's ``utils/pose_utils.py`` (the LLFF imgs2poses
toolchain it vendors):

- ``colmap_to_llff_poses`` / ``save_poses_bounds`` — load_colmap_data +
  save_poses (pose_utils.py:10-87): per-image [3,5] matrices holding the
  c2w rotation/translation in LLFF's [-u, r, -t] axis order with an
  (h, w, focal) column appended, plus per-view [0.1%, 99.9%] depth bounds
  from the visible sparse points.
- ``load_poses_bounds`` — load_data's pose/bounds part (pose_utils.py:195-239).
- ``minify_images`` — image-pyramid generation (pose_utils.py:141-190);
  the reference shells out to ImageMagick's ``mogrify``, here PIL resizes
  in-process (zero-egress image has no ImageMagick).

Environment gate (documented): the reference's ``gen_poses`` optionally
RUNS the colmap binary (pose_utils.py:258-267 via colmap_wrapper); this
image has no colmap executable, so ``gen_poses`` here requires an existing
``sparse/0`` model and raises with a clear message otherwise.
"""

from __future__ import annotations

import os

import numpy as np

from radegs_tpu.data.colmap import (
    _read,
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
)

IMG_EXTS = (".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG")


def read_points3d_with_tracks(path):
    """points3D.bin -> {pid: (xyz (3,), image_ids (k,))}. The hot-path
    reader (data/colmap.py) skips tracks; LLFF's per-view depth bounds need
    the visibility, so this prep-only reader keeps them."""
    out = {}
    with open(path, "rb") as f:
        (num,) = _read(f, 8, "Q")
        for _ in range(num):
            data = _read(f, 43, "QdddBBBd")
            (track_len,) = _read(f, 8, "Q")
            track = _read(f, 8 * track_len, "ii" * track_len)
            out[data[0]] = (np.asarray(data[1:4]),
                            np.asarray(track[0::2], np.int64))
    return out


def colmap_to_llff_poses(realdir):
    """(poses (3,5,N), pts3d dict, perm) — pose_utils.py:10-52.

    poses[:, :4, i] is the i-th c2w in LLFF's [-u, r, -t] row order (down,
    right, backwards -> up, right, back... the LLFF convention swap), and
    poses[:, 4, i] = (h, w, focal)."""
    sparse = os.path.join(realdir, "sparse", "0")
    camdata = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    cam = camdata[sorted(camdata.keys())[0]]
    hwf = np.array([cam.height, cam.width, cam.params[0]],
                   np.float64).reshape(3, 1)

    imdata = read_images_binary(os.path.join(sparse, "images.bin"))
    names = [imdata[k].name for k in imdata]
    perm = np.argsort(names)
    bottom = np.array([[0, 0, 0, 1.0]])
    w2c = []
    for k in imdata:
        im = imdata[k]
        R = qvec2rotmat(im.qvec)
        m = np.concatenate(
            [np.concatenate([R, np.reshape(im.tvec, (3, 1))], 1), bottom], 0)
        w2c.append(m)
    c2w = np.linalg.inv(np.stack(w2c))
    poses = c2w[:, :3, :4].transpose(1, 2, 0)  # (3, 4, N)
    poses = np.concatenate(
        [poses, np.tile(hwf[..., None], (1, 1, poses.shape[-1]))], 1)
    # [r, -u, t] -> [-u, r, -t] (pose_utils.py:49-50)
    poses = np.concatenate(
        [poses[:, 1:2], poses[:, 0:1], -poses[:, 2:3], poses[:, 3:4],
         poses[:, 4:5]], 1)
    pts3d = read_points3d_with_tracks(os.path.join(sparse, "points3D.bin"))
    return poses, pts3d, perm


def save_poses_bounds(basedir, poses, pts3d, perm):
    """poses_bounds.npy: (N, 17) = raveled (3,5) pose + [near, far] depth
    percentiles of the view's visible sparse points (pose_utils.py:55-87)."""
    n_img = poses.shape[-1]
    pts_arr = []
    vis_arr = []
    for k in pts3d:
        xyz, image_ids = pts3d[k]
        pts_arr.append(np.asarray(xyz, np.float64))
        cams = np.zeros(n_img)
        for ind in np.asarray(image_ids):
            if ind - 1 >= n_img:
                raise ValueError(
                    "point visibility references image id beyond the pose "
                    "count (pose_utils.py:62-64)")
            cams[ind - 1] = 1
        vis_arr.append(cams)
    pts_arr = np.array(pts_arr)
    vis_arr = np.array(vis_arr)

    # depth of each point along each view's forward axis (-t row = axis 2)
    zvals = np.sum(
        -(pts_arr[:, None, :].transpose(2, 0, 1) - poses[:3, 3:4, :])
        * poses[:3, 2:3, :], 0)  # (P, N)
    save_arr = []
    for i in perm:
        zs = zvals[:, i][vis_arr[:, i] == 1]
        if len(zs) == 0:
            raise ValueError(f"view {i} sees no sparse points")
        close, inf = np.percentile(zs, 0.1), np.percentile(zs, 99.9)
        save_arr.append(
            np.concatenate([poses[..., i].ravel(), [close, inf]], 0))
    out = np.array(save_arr)
    np.save(os.path.join(basedir, "poses_bounds.npy"), out)
    return out


def load_poses_bounds(basedir):
    """(poses (3,5,N), bds (2,N)) from poses_bounds.npy
    (pose_utils.py:195-199)."""
    arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = arr[:, :-2].reshape(-1, 3, 5).transpose(1, 2, 0)
    bds = arr[:, -2:].transpose(1, 0)
    return poses, bds


def minify_images(basedir, factors=(), resolutions=()):
    """images_{f}/ and images_{W}x{H}/ pyramids via PIL (pose_utils.py:
    141-190 semantics without the ImageMagick dependency)."""
    from PIL import Image

    imgdir = os.path.join(basedir, "images")
    files = [f for f in sorted(os.listdir(imgdir)) if f.endswith(IMG_EXTS)]
    for r in list(factors) + list(resolutions):
        if isinstance(r, int):
            name = f"images_{r}"
        else:
            name = f"images_{r[1]}x{r[0]}"  # reference names by {W}x{H}
        outdir = os.path.join(basedir, name)
        if os.path.exists(outdir):
            continue
        os.makedirs(outdir)
        for f in files:
            img = Image.open(os.path.join(imgdir, f))
            if isinstance(r, int):
                size = (img.width // r, img.height // r)
            else:
                size = (r[1], r[0])
            img = img.resize(size, Image.LANCZOS)
            img.save(os.path.join(
                outdir, os.path.splitext(f)[0] + ".png"))


def gen_poses(basedir, factors=None):
    """pose_utils.py:258-283 minus the colmap invocation (no colmap binary
    in this environment — run COLMAP elsewhere and provide sparse/0)."""
    sparse = os.path.join(basedir, "sparse", "0")
    needed = ["cameras.bin", "images.bin", "points3D.bin"]
    have = os.listdir(sparse) if os.path.isdir(sparse) else []
    if not all(f in have for f in needed):
        raise FileNotFoundError(
            f"{sparse} must contain {needed}; this environment has no "
            "colmap executable to create it (the reference would run "
            "colmap here, pose_utils.py:258-267)")
    poses, pts3d, perm = colmap_to_llff_poses(basedir)
    save_poses_bounds(basedir, poses, pts3d, perm)
    if factors:
        minify_images(basedir, factors=factors)
    return True

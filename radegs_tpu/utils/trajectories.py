"""Camera-path generation for turntable/video rendering
(utils/render_utils.py:1-281 capability: ellipse paths around a scene)."""

from __future__ import annotations

import numpy as np

from radegs_tpu.core.camera import Camera


def ellipse_path(cameras, n_frames: int = 120, const_speed: bool = True,
                 z_variation: float = 0.0, z_phase: float = 0.0):
    """Fit an ellipse through the camera centers (in the camera-ring plane)
    and emit n_frames look-at poses toward the scene focus.

    cameras: list of core.camera.Camera (train cameras).
    Returns a list of Camera with the first camera's intrinsics.
    """
    centers = np.stack([np.asarray(c.camera_center) for c in cameras])
    focus = centers.mean(axis=0)
    offsets = centers - focus
    # principal plane of the ring
    _, _, vt = np.linalg.svd(offsets, full_matrices=False)
    a1, a2 = vt[0], vt[1]
    up = np.cross(a1, a2)
    # keep 'up' pointing like the cameras' average up (-y rows of R)
    avg_up = -np.stack([np.asarray(c.R)[:, 1] for c in cameras]).mean(axis=0)
    if np.dot(up, avg_up) < 0:
        up = -up

    u = offsets @ a1
    v = offsets @ a2
    ra, rb = np.percentile(np.abs(u), 90), np.percentile(np.abs(v), 90)
    h = offsets @ up

    ref = cameras[0]
    out = []
    for i in range(n_frames):
        th = 2 * np.pi * i / n_frames
        z = z_variation * np.sin(th + z_phase) * np.std(h)
        eye = focus + ra * np.cos(th) * a1 + rb * np.sin(th) * a2 + (np.mean(h) + z) * up
        out.append(
            Camera.look_at(eye, focus, up, float(np.asarray(ref.fovx)),
                           float(np.asarray(ref.fovy)), ref.width, ref.height)
        )
    return out


def render_path(state, cameras, bg, out_dir, kernel_size=0.0, max_per_tile=512,
                save_depth=False):
    """Render a camera path to numbered PNGs (render_utils video capability;
    assemble with any ffmpeg if available)."""
    import os

    import numpy as np

    from radegs_tpu.renderer import render_compiled as render
    from radegs_tpu.utils.vis import apply_depth_colormap

    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    for i, cam in enumerate(cameras):
        out = render(state, cam, bg, kernel_size=kernel_size, max_per_tile=max_per_tile)
        img = (np.clip(np.asarray(out["render"]), 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_dir, f"{i:05d}.png"))
        if save_depth:
            d = np.asarray(out["median_depth"][0])
            dc = (apply_depth_colormap(d, np.asarray(out["mask"][0])) * 255).astype(np.uint8)
            Image.fromarray(dc).save(os.path.join(out_dir, f"{i:05d}_depth.png"))
    return out_dir

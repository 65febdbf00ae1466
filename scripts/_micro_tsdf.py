"""Micro: where does fuse_tsdf spend its time? Uses ANALYTIC depth maps of
the soak scene (sphere r=1.3 + ground plane y=-1.4) at 1600x1200 x 8 orbit
views — no renderer, isolates fusion + meshing.

    python scripts/_micro_tsdf.py            # TPU (sampling) + host stages
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def analytic_depth(E, K, W, H):
    """Ray-cast depth of sphere(0,r=1.3) union plane(y=-1.4), camera-space z."""
    ys, xs = np.mgrid[0:H, 0:W]
    x = (xs + 0.5 - K[0, 2]) / K[0, 0]
    y = (ys + 0.5 - K[1, 2]) / K[1, 1]
    d_cam = np.stack([x, y, np.ones_like(x)], -1)
    R = E[:3, :3]  # world->cam
    o_w = -E[:3, 3] @ R  # camera origin in world
    d_w = d_cam @ R  # rays in world
    # sphere |o + t d| = r
    a = (d_w * d_w).sum(-1)
    b = 2 * (d_w * o_w[None, None]).sum(-1)
    c = (o_w * o_w).sum() - 1.3 ** 2
    disc = b * b - 4 * a * c
    t_s = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), np.inf)
    t_s = np.where(t_s > 0, t_s, np.inf)
    # plane y = -1.4
    t_p = (-1.4 - o_w[1]) / d_w[..., 1]
    t_p = np.where(t_p > 0, t_p, np.inf)
    t = np.minimum(t_s, t_p)
    # bounded scene like a rendered one: drop far-field plane pixels
    z = np.where(np.isfinite(t) & (t < 7.0), t, 0.0)
    return z.astype(np.float32)


def main():
    from radegs_tpu.core.camera import Camera
    from radegs_tpu.mesh.tsdf import fuse_tsdf, tsdf_to_mesh

    W, H = 1600, 1200
    views = []
    for i in range(8):
        a = 2 * np.pi * i / 8
        eye = [4.5 * np.sin(a), 0.45 + 0.4 * np.sin(2 * a), -4.5 * np.cos(a)]
        cam = Camera.look_at(eye, [0, 0, 0], [0, 1, 0], 0.9, 0.7, W, H)
        E = np.asarray(cam.world_view, np.float64)  # w2c, same as tsdf.py:57
        K = np.array([[float(cam.focal_x), 0, W / 2],
                      [0, float(cam.focal_y), H / 2], [0, 0, 1]], np.float64)
        D = analytic_depth(E, K, W, H)
        views.append((D, E, K))
        if i == 0:
            print("depth range", D[D > 0].min(), D.max(), "valid",
                  (D > 0).mean().round(3), flush=True)

    for tag, kw in [
        ("tight margin (trunc+2v), f16 io", {}),
        ("2-block margin (old superset)", dict(margin_voxels=32)),
    ]:
        t0 = time.perf_counter()
        tsdf, w8, origin, vsz = fuse_tsdf(views, voxel_size=0.004, **kw)
        t_fuse = time.perf_counter() - t0
        t1 = time.perf_counter()
        verts, faces = tsdf_to_mesh(tsdf, w8, origin, vsz)
        t_mesh = time.perf_counter() - t1
        print(f"{tag}: fuse {t_fuse:.1f} s, mesh {t_mesh:.1f} s, "
              f"verts {len(verts)}", flush=True)


if __name__ == "__main__":
    main()

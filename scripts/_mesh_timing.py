"""Time extract_mesh_tsdf on the soak-analogue state (600k surface splats
at opacity 0.85, 8 orbit views, voxel 0.004) — the same mesh phase
soak_dense.py reports, without paying 600 training iterations.

    python scripts/_mesh_timing.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench
    import jax.numpy as jnp

    from radegs_tpu.mesh.tsdf import fuse_tsdf, render_depth_maps, tsdf_to_mesh
    from radegs_tpu.models import gaussian_model as gm
    from scripts.soak_dense import orbit_cameras

    W, H = bench.WIDTH, bench.HEIGHT
    rng = np.random.default_rng(0)
    pts = bench._surface_points(600_000, rng)
    cols = rng.uniform(0.1, 0.9, size=(600_000, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=gm.round_capacity(600_000))
    cams = orbit_cameras(12, W, H)
    state = gm.update_3d_filter(state, cams)
    state = state.replace(params=state.params.replace(
        opacity=jnp.where(state.active[:, None],
                          gm.inverse_sigmoid(jnp.float32(0.85)),
                          state.params.opacity)))
    views = [(cam, None, i) for i, cam in enumerate(cams[:8])]
    bg = jnp.zeros(3)

    t0 = time.perf_counter()
    maps = render_depth_maps(state, views, 0.1, bg, max_per_tile=1024)
    t_r = time.perf_counter() - t0
    print(f"depth maps: {t_r:.1f} s", flush=True)
    t1 = time.perf_counter()
    tsdf, w8, origin, vsz = fuse_tsdf(maps, voxel_size=0.004)
    t_f = time.perf_counter() - t1
    print(f"fuse: {t_f:.1f} s  grid {tsdf.shape}", flush=True)
    t2 = time.perf_counter()
    verts, faces = tsdf_to_mesh(tsdf, w8, origin, vsz)
    t_m = time.perf_counter() - t2
    print(f"mesh: {t_m:.1f} s  verts {len(verts)}", flush=True)
    print(f"TOTAL (no PLY write): {t_r + t_f + t_m:.1f} s", flush=True)


if __name__ == "__main__":
    main()

"""Tetra seed-decimation quality sweep (VERDICT r3 #4).

Round 3 chose the 2-sigma voxel seed decimation by Delaunay WALL CLOCK
alone (465 s -> 30 s at 9.9% seeds kept); this scores the decision on mesh
QUALITY: extract the marching-tetrahedra mesh from an on-surface splat
cloud (the quality_dense analytic sphere+plane scene, noise=0 — closed-form
chamfer ground truth, no training in the loop) at several decimation
settings and report keep-fraction x chamfer x per-phase wall-clock.

Reference seed density being decimated: 8 box corners @3sigma + center per
Gaussian (scene/gaussian_model.py:399-429).

    python scripts/decimation_sweep.py                # CPU-scale smoke
    python scripts/decimation_sweep.py --n_points 600000 --width 1600 \
        --height 1200 --device tpu --report DECIM_SWEEP_R4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_points", type=int, default=40_000)
    ap.add_argument("--n_views", type=int, default=6)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=300)
    ap.add_argument("--settings", nargs="+", default=None,
                    help="decimation voxel settings: 'full', 'auto' (2sigma)"
                         " or sigma multiples like '1.0' '3.0'")
    ap.add_argument("--report", type=str, default="DECIM_SWEEP_R4.json")
    from radegs_tpu.utils.platform import add_device_arg, apply_device
    add_device_arg(ap)
    args = ap.parse_args()
    apply_device(args.device)

    import bench
    import jax.numpy as jnp
    from quality_dense import mesh_chamfer
    from soak_dense import orbit_cameras

    from radegs_tpu.mesh.extract_tetra import extract_mesh_tetrahedra
    from radegs_tpu.models import gaussian_model as gm

    rng = np.random.default_rng(0)
    pts = bench._surface_points(args.n_points, rng, noise=0.0)
    cols = rng.uniform(0.1, 0.9, size=(args.n_points, 3)).astype(np.float32)
    cams = orbit_cameras(args.n_views, args.width, args.height)
    state = gm.create_from_points(pts, cols,
                                  capacity=gm.round_capacity(args.n_points))
    state = gm.update_3d_filter(state, cams)
    state = state.replace(params=state.params.replace(
        opacity=jnp.where(state.active[:, None],
                          gm.inverse_sigmoid(jnp.float32(0.85)),
                          state.params.opacity)))
    bg = jnp.zeros(3)
    views = [(c, None, i) for i, c in enumerate(cams)]

    # seed half-extents are 3*sigma_max per axis; the extractor's 'auto'
    # voxel is median(3sigma scales) * 2/3 = 2 sigma (extract_tetra.py:
    # 146-155). Express the sweep as k-sigma voxels in the same basis.
    scale3_med = float(np.median(
        np.asarray(jnp.exp(state.params.scaling)).max(axis=1)
        [np.asarray(state.active)]))
    sigma_med = scale3_med / 3.0
    settings = args.settings or ["full", "1.0", "auto", "3.0"]

    results = []
    for s in settings:
        if s == "full":
            dec = None
        elif s == "auto":
            dec = "auto"  # = 2 sigma
        else:
            dec = float(s) * sigma_med
        t0 = time.time()
        verts, faces = extract_mesh_tetrahedra(
            state, views, kernel_size=0.1, bg=bg, decimate=dec,
            out_path=None)
        wall = time.time() - t0
        score = mesh_chamfer(verts, faces, np.random.default_rng(7))
        rec = {"setting": s, "decimate_voxel": dec if dec else 0.0,
               "wall_s": round(wall, 1), "verts": int(len(verts)),
               **{k: round(v, 6) if isinstance(v, float) else v
                  for k, v in score.items()}}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.report, "w") as f:
            json.dump({"n_points": args.n_points,
                       "resolution": [args.width, args.height],
                       "n_views": args.n_views,
                       "sigma_median": sigma_med,
                       "results": results}, f, indent=1)
    print(f"report -> {args.report}", flush=True)


if __name__ == "__main__":
    main()

"""Realistic-scale soak: train on a dense surface scene at 1600x1200 with
the full reference schedule (densification, opacity resets, budget growth),
report sustained it/s + rays/s at the GROWN capacity, then time mesh
extraction — the converged-scene numbers BENCH's tuned 100k step can't show.

    python scripts/soak_dense.py --iters 3000 --report /tmp/soak.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def orbit_cameras(n, width, height, radius=4.5, elev=0.45):
    from radegs_tpu.core.camera import Camera

    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = [radius * np.sin(a), elev + 0.4 * np.sin(2 * a), -radius * np.cos(a)]
        cams.append(Camera.look_at(eye, [0, 0, 0], [0, 1, 0], 0.9, 0.7, width, height))
    return cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--n_views", type=int, default=12)
    ap.add_argument("--n_points", type=int, default=600_000)
    ap.add_argument("--report", type=str, default="/tmp/soak_dense.json")
    ap.add_argument("--mesh", action="store_true", help="extract meshes at the end")
    ap.add_argument("--densify_until", type=int, default=None)
    args = ap.parse_args()

    import bench
    import jax
    import jax.numpy as jnp

    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.renderer import render_compiled
    from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig
    from radegs_tpu.train.loop import SceneLike, train

    W, H = bench.WIDTH, bench.HEIGHT
    rng = np.random.default_rng(0)
    pts = bench._surface_points(args.n_points, rng)
    cols = rng.uniform(0.1, 0.9, size=(args.n_points, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=gm.round_capacity(args.n_points))
    cams = orbit_cameras(args.n_views, W, H)
    state = gm.update_3d_filter(state, cams)

    # ground truth: renders of a jittered, OPAQUE copy (converged scenes
    # have high-opacity surface splats; stable targets that force real
    # gradients + densification pressure)
    gt_state = state.replace(
        params=state.params.replace(
            xyz=state.params.xyz + 0.01 * rng.normal(size=(state.capacity, 3)).astype(np.float32),
            f_dc=state.params.f_dc * 1.1,
            opacity=jnp.where(
                state.active[:, None],
                gm.inverse_sigmoid(jnp.float32(0.85)),
                state.params.opacity,
            ),
        )
    )
    bg = jnp.zeros(3)
    print("rendering ground-truth views...", flush=True)
    views = []
    for i, cam in enumerate(cams):
        img = render_compiled(gt_state, cam, bg, kernel_size=0.1,
                              max_per_tile=1024)["render"]
        views.append((cam, jnp.clip(img, 0, 1), i))
        print(f"  gt view {i + 1}/{len(cams)}", flush=True)

    mcfg = ModelConfig(kernel_size=0.1)
    ocfg = OptimizationConfig(
        iterations=args.iters,
        regularization_from_iter=min(15000, args.iters // 2),
        densify_until_iter=args.densify_until or min(15000, int(args.iters * 0.8)),
    )
    pcfg = PipelineConfig(max_per_tile=1024)

    stamps = []

    def on_it(it, ts, m):
        if m is not None:
            stamps.append((it, time.perf_counter(), m.get("psnr", 0.0),
                           m.get("n_instances", 0)))
            print(f"[{it}] psnr {m['psnr']:.2f} loss {m['loss']:.4f} "
                  f"inst {m['n_instances']:.0f}", flush=True)

    t0 = time.perf_counter()
    ts, history = train(SceneLike(cameras=views, extent=4.5), state,
                        mcfg, ocfg, pcfg, log_every=100, callbacks=[on_it])
    t_train = time.perf_counter() - t0

    n_active = int(ts.gaussians.n_active())
    # sustained it/s over the LAST quarter (grown capacity, steady state)
    tail = [s for s in stamps if s[0] >= args.iters * 3 // 4]
    if len(tail) >= 2:
        its = (tail[-1][0] - tail[0][0]) / (tail[-1][1] - tail[0][1])
    else:
        its = args.iters / t_train
    report = {
        "iters": args.iters,
        "n_views": args.n_views,
        "resolution": [W, H],
        "n_active_final": n_active,
        "capacity_final": ts.gaussians.capacity,
        "train_wall_s": t_train,
        "sustained_it_per_s": its,
        "sustained_rays_per_s": its * W * H,
        "final_psnr": float(stamps[-1][2]) if stamps else None,
        "final_instances": float(stamps[-1][3]) if stamps else None,
    }

    if args.mesh:
        from radegs_tpu.mesh.tsdf import extract_mesh_tsdf

        t1 = time.perf_counter()
        verts, faces = extract_mesh_tsdf(
            ts.gaussians, views[:8], mcfg.kernel_size, bg, voxel_size=0.004,
            out_path="/tmp/soak_tsdf.ply")
        report["tsdf_8view_s"] = time.perf_counter() - t1
        report["tsdf_verts"] = int(verts.shape[0])

        from radegs_tpu.mesh.extract_tetra import extract_mesh_tetrahedra

        t2 = time.perf_counter()
        verts2, faces2 = extract_mesh_tetrahedra(
            ts.gaussians, views[:8], mcfg.kernel_size, bg,
            out_path="/tmp/soak_tetra.ply")
        report["tetra_8view_s"] = time.perf_counter() - t2
        report["tetra_verts"] = int(verts2.shape[0])

    print(json.dumps(report, indent=2))
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()

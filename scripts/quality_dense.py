"""Quality-at-schedule protocol run (BASELINE.md quality parity evidence).

Mirrors the reference's in-train evaluation protocol (train.py:246-270:
held-out PSNR at fixed eval iterations) plus the DTU mesh evaluation
(dtu_eval/eval.py:120-167) — but on the dense synthetic scene whose ground
truth is CLOSED-FORM, so mesh accuracy needs no captured dataset:

- Scene: the bench dense surface with ``noise=0`` — a |x| = 1.3 sphere and a
  y = -1.4 plane patch (|x|,|z| <= 3).  Distance to the surface union is
  analytic, so "accuracy" (mesh -> surface) is exact, and "completeness"
  (surface -> mesh) samples the analytic surface directly.
- GT images: renders of an opaque splat cloud sitting exactly ON the
  surface.  The TRAINING state starts from a jittered copy (sigma 0.02 off
  the surface) — optimization must pull splats back onto the surface for
  the extracted mesh to score.
- Held-out eval: every ``eval_every``-th orbit view is excluded from
  training; PSNR on those is logged at the eval iterations.
- Mesh eval: both extractors (TSDF + Marching Tetrahedra), each scored
  accuracy / completeness / overall a la DTU (mean distances, ``max_dist``
  outlier cap), with mesh samples from eval.dtu.sample_mesh_surface.

Writes QUALITY_r{N}.json.

    python scripts/quality_dense.py --iters 7000 --report QUALITY_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PLANE_Y = -1.4
PLANE_HALF = 3.0
SPHERE_R = 1.3


def analytic_distance(p):
    """Exact unsigned distance from points (N,3) to the scene surface
    (sphere |x| = R  union  finite plane patch y = PLANE_Y, |x|,|z| <= 3)."""
    d_sphere = np.abs(np.linalg.norm(p, axis=1) - SPHERE_R)
    dx = np.maximum(np.abs(p[:, 0]) - PLANE_HALF, 0.0)
    dz = np.maximum(np.abs(p[:, 2]) - PLANE_HALF, 0.0)
    dy = p[:, 1] - PLANE_Y
    d_plane = np.sqrt(dx * dx + dy * dy + dz * dz)
    return np.minimum(d_sphere, d_plane)


def sample_analytic_surface(n, rng):
    """Uniform samples of the OBSERVED analytic surface (visibility proxy:
    the orbit cameras see the whole sphere above y = -1.25 and the plane
    outside the sphere's shadow ring and inside the frustum-covered area)."""
    # sphere: area-uniform directions, keep y above the near-plane ring
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sph = d[d[:, 1] > -1.25 / SPHERE_R] * SPHERE_R
    # plane: uniform in the annulus 1.6 < r_xz, |x|,|z| < 2.7
    m = rng.uniform(-2.7, 2.7, size=(n, 2))
    r = np.hypot(m[:, 0], m[:, 1])
    m = m[r > 1.6]
    pl = np.stack([m[:, 0], np.full(len(m), PLANE_Y), m[:, 1]], axis=1)
    return np.concatenate([sph, pl]).astype(np.float32)


def mesh_chamfer(verts, faces, rng, max_dist=0.5, sample_thresh=0.02):
    """DTU-style two-sided score vs the analytic surface."""
    from scipy.spatial import cKDTree

    from radegs_tpu.eval.dtu import sample_mesh_surface

    mesh_pts = sample_mesh_surface(
        np.asarray(verts, np.float64), np.asarray(faces), sample_thresh
    ).astype(np.float32)
    # accuracy: mesh -> surface, exact
    d2s = analytic_distance(mesh_pts)
    acc = float(d2s[d2s < max_dist].mean())
    # completeness: surface -> mesh samples
    surf = sample_analytic_surface(200_000, rng)
    s2d, _ = cKDTree(mesh_pts).query(surf, workers=-1)
    comp = float(s2d[s2d < max_dist].mean())
    return {
        "accuracy_mean": acc,
        "completeness_mean": comp,
        "overall": (acc + comp) / 2,
        "accuracy_median": float(np.median(d2s)),
        "completeness_median": float(np.median(s2d)),
        "outlier_frac_acc": float((d2s >= max_dist).mean()),
        "mesh_samples": int(mesh_pts.shape[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--eval_iters", nargs="+", type=int,
                    default=[1000, 3000, 7000])
    ap.add_argument("--n_views", type=int, default=16)
    ap.add_argument("--eval_every", type=int, default=4,
                    help="every k-th orbit view is held out for eval")
    ap.add_argument("--n_points", type=int, default=600_000)
    ap.add_argument("--report", type=str, default="QUALITY_r03.json")
    ap.add_argument("--densify_until", type=int, default=None)
    ap.add_argument("--skip_mesh", action="store_true")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="orbax dir: save at each eval iteration and resume "
                         "from it if present (a timeout mid-30k-run loses "
                         "nothing)")
    ap.add_argument("--width", type=int, default=None,
                    help="override the protocol 1600x1200 (CPU smoke runs)")
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--wall_budget", type=float, default=None,
                    help="training wall-clock budget in seconds: the loop "
                         "stops GRACEFULLY (StopTraining) when exceeded, so "
                         "the final eval + mesh extraction still run and "
                         "the artifact is complete (honest iters_completed) "
                         "instead of dying in an outer timeout")
    from radegs_tpu.utils.platform import add_device_arg, apply_device
    add_device_arg(ap)
    args = ap.parse_args()
    apply_device(args.device)

    import bench
    import jax
    import jax.numpy as jnp
    from soak_dense import orbit_cameras

    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.utils.compilelog import CompileCounter

    compiles = CompileCounter().install()
    from radegs_tpu.ops.ssim import psnr
    from radegs_tpu.renderer import render_compiled
    from radegs_tpu.train.config import (ModelConfig, OptimizationConfig,
                                         PipelineConfig)
    from radegs_tpu.train.loop import SceneLike, train

    W = args.width or bench.WIDTH
    H = args.height or bench.HEIGHT
    rng = np.random.default_rng(0)
    pts = bench._surface_points(args.n_points, rng, noise=0.0)
    cols = rng.uniform(0.1, 0.9, size=(args.n_points, 3)).astype(np.float32)
    cams = orbit_cameras(args.n_views, W, H)

    # GT state: splats ON the surface, opaque, slightly brighter
    gt_state = gm.create_from_points(
        pts, cols, capacity=gm.round_capacity(args.n_points))
    gt_state = gm.update_3d_filter(gt_state, cams)
    gt_state = gt_state.replace(
        params=gt_state.params.replace(
            opacity=jnp.where(
                gt_state.active[:, None],
                gm.inverse_sigmoid(jnp.float32(0.85)),
                gt_state.params.opacity,
            )
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
    train_views = [v for i, v in enumerate(views) if i % args.eval_every]
    test_views = [v for i, v in enumerate(views) if not i % args.eval_every]
    print(f"{len(train_views)} train / {len(test_views)} test views",
          flush=True)

    # training state: jittered OFF the surface — the schedule must pull it
    # back for the mesh to score
    state = gm.create_from_points(
        pts + 0.02 * rng.normal(size=pts.shape).astype(np.float32),
        cols, capacity=gm.round_capacity(args.n_points))
    state = gm.update_3d_filter(state, cams)

    mcfg = ModelConfig(kernel_size=0.1)
    ocfg = OptimizationConfig(
        iterations=args.iters,
        regularization_from_iter=min(15000, args.iters // 2),
        densify_until_iter=args.densify_until
        or min(15000, int(args.iters * 0.8)),
    )
    pcfg = PipelineConfig(max_per_tile=1024)

    eval_at = sorted(set(min(e, args.iters) for e in args.eval_iters))
    eval_log = []
    stamps = []
    health = {"overflow_events": 0, "overflow_instances": 0.0,
              "nan_events": 0}

    # incremental report: a timeout mid-run must still leave an artifact
    report = {
        "protocol": "quality_dense analytic-surface (sphere+plane)",
        "iters": args.iters,
        "resolution": [W, H],
        "partial": True,
        "eval": eval_log,
        "health": health,
    }

    def phase_rates():
        """it/s per 1000-iteration bucket (VERDICT r3 #3: sustained rate per
        schedule phase — densify ramp, post-densify, regularized tail)."""
        out = {}
        for b in range(0, args.iters, 1000):
            seg = [s for s in stamps if b <= s[0] < b + 1000]
            if len(seg) >= 2:
                out[f"{b}-{b + 1000}"] = round(
                    (seg[-1][0] - seg[0][0]) / (seg[-1][1] - seg[0][1]), 3)
        return out

    def flush_report():
        report["it_per_s_by_1k"] = phase_rates()
        report["xla_compiles"] = compiles.total
        report["xla_compile_wall_s"] = round(compiles.total_s, 1)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)

    def eval_test(ts, it):
        ps = []
        for cam, gt_img, _ in test_views:
            img = render_compiled(ts.gaussians, cam, bg,
                                  kernel_size=mcfg.kernel_size,
                                  max_per_tile=pcfg.max_per_tile)["render"]
            ps.append(float(psnr(jnp.clip(img, 0, 1), gt_img)))
        # train-view PSNR on a fixed subset: the train/test gap separates
        # protocol overfit (few orbit views) from real optimization
        # regressions — the reference logs the same pair (train.py:246-270)
        # strided subset so the train PSNR probe covers the orbit (the
        # reference samples strided too, train.py: range(5, 30, 5)); a
        # consecutive prefix clusters the cameras in one arc
        stride = max(1, len(train_views) // len(test_views))
        pt = []
        for cam, gt_img, _ in train_views[::stride][:len(test_views)]:
            img = render_compiled(ts.gaussians, cam, bg,
                                  kernel_size=mcfg.kernel_size,
                                  max_per_tile=pcfg.max_per_tile)["render"]
            pt.append(float(psnr(jnp.clip(img, 0, 1), gt_img)))
        rec = {"iter": it, "psnr_test": float(np.mean(ps)),
               "psnr_train": float(np.mean(pt)),
               "psnr_per_view": ps,
               "n_active": int(ts.gaussians.n_active())}
        eval_log.append(rec)
        flush_report()
        print(f"[eval {it}] test psnr {rec['psnr_test']:.2f} "
              f"({rec['n_active']} splats)", flush=True)

    from radegs_tpu.train.loop import StopTraining

    t_loop0 = time.perf_counter()
    stopped_at = {"it": None}

    def on_it(it, ts, m):
        if (args.wall_budget is not None and stopped_at["it"] is None
                and time.perf_counter() - t_loop0 > args.wall_budget):
            stopped_at["it"] = it
            eval_test(ts, it)
            if args.checkpoint:
                from radegs_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(args.checkpoint, ts, it)
                print(f"[ckpt] saved at {it} (wall budget cut)", flush=True)
            print(f"[wall budget] stopping gracefully at iteration {it}",
                  flush=True)
            raise StopTraining
        if m is not None:
            stamps.append((it, time.perf_counter()))
            print(f"[{it}] psnr {m['psnr']:.2f} loss {m['loss']:.4f} "
                  f"inst {m['n_instances']:.0f} pts {m['n_active']}",
                  flush=True)
            if m["n_overflow"] > 0 or m["tile_overflow"] > 0:
                health["overflow_events"] += 1
                health["overflow_instances"] += float(m["n_overflow"])
            if not np.isfinite(m["loss"]):
                health["nan_events"] += 1
            if it % 500 == 0:
                flush_report()
        if it in eval_at:
            eval_test(ts, it)
            if args.checkpoint:
                from radegs_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(args.checkpoint, ts, it)
                print(f"[ckpt] saved at {it}", flush=True)

    resume_state, start_it = None, 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        from radegs_tpu.train.loop import init_train_state
        from radegs_tpu.utils.checkpoint import load_checkpoint

        template = init_train_state(state, jax.random.PRNGKey(0))
        resume_state, start_it = load_checkpoint(args.checkpoint, template)
        print(f"resumed from {args.checkpoint} at iteration {start_it}",
              flush=True)

    t0 = time.perf_counter()
    ts, history = train(SceneLike(cameras=train_views, extent=4.5), state,
                        mcfg, ocfg, pcfg, log_every=100, callbacks=[on_it],
                        resume_state=resume_state)
    t_train = time.perf_counter() - t0

    # checkpoint-recovery mode (resume iter == --iters): the loop body never
    # runs, so the callback eval never fires — produce the final eval here.
    # (A wall-budget stop already evaluated at its stop iteration.)
    if stopped_at["it"] is None and \
            not any(e["iter"] >= args.iters for e in eval_log):
        eval_test(ts, args.iters)

    # checkpoint-recovery mode (loop ran zero iterations): there IS no
    # training-throughput measurement — t_train is setup time only. Null the
    # rate fields so the artifact cannot be read as one (ADVICE r4).
    recovery_only = start_it >= args.iters
    no_rate = recovery_only or not stamps  # no throughput was measured
    done_it = stopped_at["it"] or args.iters
    tail = [s for s in stamps if s[0] >= done_it * 3 // 4]
    if no_rate:
        sustained = None
        t_train = None
    elif len(tail) >= 2:
        sustained = (tail[-1][0] - tail[0][0]) / (tail[-1][1] - tail[0][1])
    else:
        sustained = done_it / t_train
    report = {
        "protocol": "quality_dense analytic-surface (sphere+plane)",
        "iters": args.iters,
        "iters_completed": done_it,
        "partial": stopped_at["it"] is not None,
        "train_views": len(train_views),
        "test_views": len(test_views),
        "resolution": [W, H],
        "recovered_from_checkpoint": recovery_only,
        "train_wall_s": t_train,
        "sustained_it_per_s": sustained,
        "it_per_s_by_1k": phase_rates(),
        "n_active_final": int(ts.gaussians.n_active()),
        "capacity_final": ts.gaussians.capacity,
        "health": health,
        "xla_compiles": compiles.total,
        "xla_compile_wall_s": round(compiles.total_s, 1),
        "xla_compiles_by_name": {k: v for k, v in compiles.by_name.items()
                                 if v > 1 or "train" in k or "densify" in k},
        "eval": eval_log,
    }

    if not args.skip_mesh:
        from radegs_tpu.mesh.extract_tetra import extract_mesh_tetrahedra
        from radegs_tpu.mesh.tsdf import extract_mesh_tsdf

        # STRIDED 8-view subset so fusion covers the whole orbit: a
        # consecutive prefix of a dense orbit sees only a fraction of the
        # ring and craters completeness (r5: 0.065 mean vs 0.018 median
        # with train_views[:8] of a 40-view orbit)
        mviews = train_views[::max(1, len(train_views) // 8)][:8]
        mrng = np.random.default_rng(7)
        t1 = time.perf_counter()
        v1, f1 = extract_mesh_tsdf(
            ts.gaussians, mviews, mcfg.kernel_size, bg,
            voxel_size=0.004, out_path="/tmp/quality_tsdf.ply")
        report["tsdf"] = {
            "wall_s": time.perf_counter() - t1, "verts": int(v1.shape[0]),
            **mesh_chamfer(v1, f1, mrng),
        }
        print("tsdf:", json.dumps(report["tsdf"]), flush=True)

        t2 = time.perf_counter()
        v2, f2 = extract_mesh_tetrahedra(
            ts.gaussians, mviews, mcfg.kernel_size, bg,
            out_path="/tmp/quality_tetra.ply")
        report["tetra"] = {
            "wall_s": time.perf_counter() - t2, "verts": int(v2.shape[0]),
            **mesh_chamfer(v2, f2, mrng),
        }
        print("tetra:", json.dumps(report["tetra"]), flush=True)

    print(json.dumps(report, indent=2))
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()

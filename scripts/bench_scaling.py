#!/usr/bin/env python
"""Weak-scaling benchmark over a device mesh (BASELINE.md: >= 0.8 efficiency
from 1 to N devices).

Shards the Gaussian/parameter axis over the mesh's `g` axis and scales the
problem (capacity) proportionally to the device count, so per-device work is
constant; efficiency = t(1) / t(N).

On real multi-chip hardware run as-is; without it, pass ``--cpu_mesh 8`` to
validate the sharding path on virtual CPU devices (CPU numbers do not
reflect ICI bandwidth — the communication-volume accounting is the
hardware-independent signal). NOTE: the JAX_PLATFORMS env var is hijacked
by the axon plugin (CLAUDE.md), so --cpu_mesh forces the platform
in-process; without it this script would try to claim the TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_one(n_devices, base_gaussians, width, height, iters, warmup,
            gspmd=False, zoom=False, vis_frac=1.0):
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig
    from radegs_tpu.train.loop import init_train_state, make_train_step

    devices = jax.devices()[:n_devices]

    P = base_gaussians * n_devices
    capacity = gm.round_capacity(P)
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(P, 3)) * 1.2).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, size=(P, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=capacity)
    state = state.replace(
        params=state.params.replace(scaling=state.params.scaling + np.log(0.22))
    )
    if zoom:
        # close-up view seeing a FRACTION of the cloud — the regime real
        # scenes (larger than any one frustum) put the visibility-compressed
        # gather in; the wide default sees ~76% and can't compress
        cam = Camera.look_at([0.4, 0.5, -1.6], [0.2, 0.1, 0], [0, 1, 0],
                             0.9, 0.7, width, height)
    else:
        cam = Camera.look_at([0, 0.8, -5.0], [0, 0, 0], [0, 1, 0], 0.9, 0.7,
                             width, height)
    state = gm.update_3d_filter(state, [cam])
    gt = jnp.clip(jnp.asarray(rng.uniform(size=(3, height, width)), jnp.float32), 0, 1)

    mcfg = ModelConfig(kernel_size=0.1)
    ocfg = OptimizationConfig(regularization_from_iter=0)
    pcfg = PipelineConfig(max_per_tile=512)
    bg = jnp.zeros(3)

    if gspmd:
        from radegs_tpu.parallel.sharding import (
            make_mesh, shard_camera, shard_train_state,
        )

        mesh = make_mesh(devices)
        ts = shard_train_state(init_train_state(state, jax.random.PRNGKey(0)), mesh)
        cam_s = shard_camera(cam, mesh)
        step = make_train_step(mcfg, ocfg, pcfg, spatial_lr_scale=5.0)
        with mesh:
            for _ in range(warmup):
                ts, m = step(ts, cam_s, gt, bg, 0, width, height)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                ts, m = step(ts, cam_s, gt, bg, 0, width, height)
            float(m["loss"])
        return (time.perf_counter() - t0) / iters, None

    # default: the explicit visibility-compressed shard_map step
    from radegs_tpu.parallel.step import (
        band_layout, make_mesh_1d, make_sharded_train_step, pad_gt,
    )

    mesh = make_mesh_1d(devices)
    step = make_sharded_train_step(
        mcfg, ocfg, pcfg, spatial_lr_scale=5.0, mesh=mesh,
        width=width, height=height,
        # vis_frac 1.0 = lossless; lower caps the static gather and relies
        # on the overflow counter to prove nothing was dropped
        vis_capacity=max(int(capacity // n_devices * vis_frac), 1 << 12),
    )
    _, _, H_pad = band_layout(height, n_devices)
    gt_p = pad_gt(gt, H_pad)
    ts = init_train_state(state, jax.random.PRNGKey(0))
    with mesh:
        for _ in range(warmup):
            ts, m = step(ts, cam, gt_p, bg)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, m = step(ts, cam, gt_p, bg)
        float(m["loss"])
        if float(m["n_vis_overflow"]) > 0:
            print(f"  [warn] vis_capacity overflow: {float(m['n_vis_overflow']):.0f}")
    dt = (time.perf_counter() - t0) / iters
    # communication-volume accounting (VERDICT r2 #7): CPU-mesh timings are
    # noise on one core, but the gathered bytes are exact and make the
    # weak-scaling claim an arithmetic bandwidth statement. The forward
    # all-gather moves 28 f32 + 2 bool columns per visible gaussian row
    # (parallel/step.py prep_all), each shard contributing its static
    # vis_capacity block.
    ROW_BYTES = 28 * 4 + 2
    comm = {
        "gather_rows_static": float(m["gather_rows"]),
        "gather_rows_ideal": float(m["n_vis"]),
        "full_gather_rows": float(m["full_gather_rows"]),
        "gather_mb_static": float(m["gather_rows"]) * ROW_BYTES / 1e6,
        "gather_mb_full": float(m["full_gather_rows"]) * ROW_BYTES / 1e6,
        "compression_vs_full_gather":
            float(m["gather_rows"]) / max(float(m["full_gather_rows"]), 1.0),
        "ideal_compression":
            float(m["n_vis"]) / max(float(m["full_gather_rows"]), 1.0),
    }
    return dt, comm


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base_gaussians", type=int, default=50_000)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--cpu_mesh", type=int, default=0, metavar="N",
                   help="force the CPU platform with N virtual devices "
                        "(env JAX_PLATFORMS is ignored here, CLAUDE.md)")
    p.add_argument("--gspmd", action="store_true",
                   help="use the GSPMD auto-sharded step instead of the "
                        "explicit visibility-compressed shard_map step")
    p.add_argument("--zoom", action="store_true",
                   help="close-up camera seeing a fraction of the cloud "
                        "(the visibility-compression regime)")
    p.add_argument("--vis_frac", type=float, default=1.0,
                   help="static per-shard gather cap as a fraction of "
                        "per-shard capacity (overflow counter reports drops)")
    args = p.parse_args(argv)

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_mesh)

    n_avail = len(jax.devices())
    counts = args.devices or [n for n in (1, 2, 4, 8, 16) if n <= n_avail]
    results = {}
    t1 = None
    for n in counts:
        dt, comm = run_one(n, args.base_gaussians, args.width, args.height,
                           args.iters, args.warmup, gspmd=args.gspmd,
                           zoom=args.zoom, vis_frac=args.vis_frac)
        if t1 is None:
            t1 = dt
        eff = t1 / dt
        results[n] = {"ms_per_iter": dt * 1000, "weak_scaling_efficiency": eff}
        line = (f"devices={n:2d}  {dt * 1000:8.1f} ms/iter  "
                f"gaussians={args.base_gaussians * n:8d}  efficiency={eff:.3f}")
        if comm is not None:
            results[n]["comm"] = comm
            line += (f"  gather={comm['gather_mb_static']:.1f}MB "
                     f"({comm['compression_vs_full_gather']:.3f}x of full, "
                     f"ideal {comm['ideal_compression']:.3f}x)")
        print(line, flush=True)
    print(json.dumps({"weak_scaling": results}))


if __name__ == "__main__":
    main()

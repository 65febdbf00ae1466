#!/usr/bin/env python
"""Training CLI — the reference's train.py re-hosted on the TPU stack.

Usage:
  python scripts/train.py -s <dataset> -m <out_dir> [--eval] [flags]
  python scripts/train.py --synthetic --iterations 300   # self-contained smoke

Reproduces train.py:61-214: loss schedule, densification windows, opacity
resets, 3D-filter refreshes, periodic test-set evaluation, PLY snapshots and
training checkpoints (orbax).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    from radegs_tpu.train.arguments import add_group
    from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig

    p = argparse.ArgumentParser(description="radegs_tpu training")
    add_group(p, ModelConfig, "ModelParams")
    add_group(p, OptimizationConfig, "OptimizationParams")
    add_group(p, PipelineConfig, "PipelineParams")
    p.add_argument("--test_iterations", nargs="+", type=int, default=[7_000, 30_000])
    p.add_argument("--save_iterations", nargs="+", type=int, default=[7_000, 30_000])
    p.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    p.add_argument("--start_checkpoint", type=str, default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--ip", type=str, default=None, help="network-GUI host (SIBR viewer)")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--synthetic", action="store_true",
                   help="train on a tiny built-in synthetic scene (no dataset needed)")
    p.add_argument("--multichip", action="store_true",
                   help="shard training over ALL visible devices (the "
                        "explicit visibility-compressed mesh step, "
                        "parallel/step.py). Single device = no-op.")
    p.add_argument("--cpu_devices", type=int, default=0,
                   help="with --device cpu: number of virtual CPU devices "
                        "(test the --multichip path without TPU hardware)")
    from radegs_tpu.utils.platform import add_device_arg
    add_device_arg(p)
    return p.parse_args(argv)


def synthetic_scene(size=64, n_cams=4, P=80, seed=0):
    import jax.numpy as jnp

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.renderer import render

    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(P, 3)) * 0.5).astype(np.float32)
    cols = rng.uniform(0.2, 0.9, size=(P, 3)).astype(np.float32)
    target = gm.create_from_points(pts, cols, capacity=gm.round_capacity(P, 128))
    target = target.replace(
        params=target.params.replace(
            opacity=jnp.where(target.active[:, None], gm.inverse_sigmoid(jnp.float32(0.8)),
                              target.params.opacity),
            scaling=target.params.scaling + 0.7,
        )
    )
    cams = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        cam = Camera.look_at([3.5 * np.sin(ang), 0.5, -3.5 * np.cos(ang)],
                             [0, 0, 0], [0, 1, 0], 0.9, 0.9, size, size)
        gt = render(target, cam, jnp.zeros(3), max_per_tile=64, instance_budget=1 << 12)
        cams.append((cam, jnp.clip(gt["render"], 0, 1), i))
    return cams, 3.5


def main(argv=None):
    args = parse_args(argv)
    from radegs_tpu.utils.platform import apply_device
    apply_device(args.device)
    import jax

    if args.cpu_devices:
        assert args.device == "cpu", "--cpu_devices requires --device cpu"
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax.numpy as jnp

    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.ops.ssim import psnr
    from radegs_tpu.renderer import render as render_fn
    from radegs_tpu.train.arguments import extract, save_cfg_args
    from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig
    from radegs_tpu.train.loop import SceneLike, train

    mcfg = extract(ModelConfig, args)
    ocfg = extract(OptimizationConfig, args)
    pcfg = extract(PipelineConfig, args)

    if not mcfg.model_path:
        uid = os.getenv("OAR_JOB_ID", str(uuid.uuid4()))[:10]
        mcfg = ModelConfig(**{**mcfg.__dict__, "model_path": f"./output/{uid}"})
    os.makedirs(mcfg.model_path, exist_ok=True)
    save_cfg_args(mcfg.model_path, mcfg)
    print(f"Output folder: {mcfg.model_path}")

    scene_obj = None
    if args.synthetic:
        cameras, extent = synthetic_scene(seed=args.seed)
        test_cams = []
        gaussians = None
        if gaussians is None:
            rng = np.random.default_rng(args.seed + 1)
            gaussians = gm.create_from_points(
                (rng.normal(size=(64, 3)) * 0.5).astype(np.float32),
                rng.uniform(size=(64, 3)).astype(np.float32),
                sh_degree=mcfg.sh_degree, capacity=128,
            )
    else:
        from radegs_tpu.data.scene import Scene

        scene_obj = Scene(
            mcfg.source_path,
            model_path=mcfg.model_path,
            images=mcfg.images,
            eval_split=mcfg.eval,
            white_background=mcfg.white_background,
            resolution=mcfg.resolution,
            seed=args.seed,
        )
        cameras = scene_obj.getTrainCameras()
        test_cams = scene_obj.getTestCameras()
        extent = scene_obj.cameras_extent
        gaussians = scene_obj.create_gaussians(sh_degree=mcfg.sh_degree)

    scene = SceneLike(cameras=cameras, extent=extent)
    bg = jnp.ones(3) if mcfg.white_background else jnp.zeros(3)

    # TensorBoard, optional like the reference (train.py:26-30, 238-278)
    tb = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(mcfg.model_path)
    except Exception:
        print("Tensorboard not available: not logging progress")

    t_start = time.time()
    last = {"t": t_start, "it": 0}

    def on_log(it, ts, metrics):
        if metrics is None:
            return
        now = time.time()
        ips = (it - last["it"]) / max(now - last["t"], 1e-9)
        last["t"], last["it"] = now, it
        if tb is not None:
            tb.add_scalar("train_loss_patches/total_loss", metrics["loss"], it)
            tb.add_scalar("train_loss_patches/l1_loss", metrics["l1"], it)
            tb.add_scalar("train_loss_patches/depth_normal_loss",
                          metrics["depth_normal_loss"], it)
            tb.add_scalar("train/psnr", metrics["psnr"], it)
            tb.add_scalar("total_points", metrics["n_active"], it)
            tb.add_scalar("iters_per_s", ips, it)
        if not args.quiet:
            print(
                f"[{it:6d}] loss {metrics['loss']:.5f}  l1 {metrics['l1']:.5f}  "
                f"psnr {metrics['psnr']:5.2f}  pts {metrics['n_active']:7d}  "
                f"{ips:6.2f} it/s",
                flush=True,
            )

    def on_schedule(it, ts, metrics):
        if it in args.test_iterations and test_cams:
            vals = []
            for cam, gt, _ in test_cams:
                out = render_fn(ts.gaussians, cam, bg, kernel_size=mcfg.kernel_size,
                                max_per_tile=pcfg.max_per_tile)
                vals.append(float(psnr(jnp.clip(out["render"], 0, 1), gt)))
            print(f"\n[ITER {it}] test PSNR {np.mean(vals):.3f} over {len(vals)} views\n",
                  flush=True)
            if tb is not None:
                tb.add_scalar("test/psnr", float(np.mean(vals)), it)
        if it in args.save_iterations:
            if scene_obj is not None:
                scene_obj.save(ts.gaussians, it)
            else:
                d = os.path.join(mcfg.model_path, "point_cloud", f"iteration_{it}")
                os.makedirs(d, exist_ok=True)
                gm.save_gaussian_ply(os.path.join(d, "point_cloud.ply"), ts.gaussians)
            print(f"[ITER {it}] saved point cloud", flush=True)
        if it in args.checkpoint_iterations:
            from radegs_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(os.path.join(mcfg.model_path, f"chkpnt{it}"), ts, it)
            print(f"[ITER {it}] saved checkpoint", flush=True)

    resume_state = None
    if args.start_checkpoint:
        from radegs_tpu.train.loop import init_train_state
        from radegs_tpu.utils.checkpoint import load_checkpoint

        template = init_train_state(gaussians, jax.random.PRNGKey(args.seed),
                                    cameras[0][0].height, cameras[0][0].width,
                                    mcfg.use_decoupled_appearance)
        resume_state, start_it = load_checkpoint(args.start_checkpoint, template)
        print(f"resumed from {args.start_checkpoint} at iteration {start_it}")

    callbacks = [on_log, on_schedule]
    if args.ip:
        from radegs_tpu.viewer.network_gui import NetworkGUI

        gui = NetworkGUI(args.ip, args.port)

        def on_gui(it, ts, metrics):
            def render_view(cam, scale_mod):
                out = render_fn(ts.gaussians, cam, bg, kernel_size=mcfg.kernel_size,
                                scaling_modifier=scale_mod,
                                max_per_tile=pcfg.max_per_tile)
                return np.asarray(out["render"])

            gui.poll(render_view, mcfg.source_path or mcfg.model_path,
                     it >= ocfg.iterations)

        callbacks.append(on_gui)

    mesh = None
    if args.multichip and len(jax.devices()) > 1:
        from radegs_tpu.parallel.step import make_mesh_1d

        mesh = make_mesh_1d(jax.devices())
        print(f"multichip: sharding over {len(jax.devices())} devices",
              flush=True)

    ts, history = train(
        scene, gaussians, mcfg, ocfg, pcfg, seed=args.seed,
        log_every=args.log_every, callbacks=tuple(callbacks),
        resume_state=resume_state, mesh=mesh,
    )

    # final snapshot
    it = int(ts.iteration)
    if scene_obj is not None:
        scene_obj.save(ts.gaussians, it)
    else:
        d = os.path.join(mcfg.model_path, "point_cloud", f"iteration_{it}")
        os.makedirs(d, exist_ok=True)
        gm.save_gaussian_ply(os.path.join(d, "point_cloud.ply"), ts.gaussians)
    with open(os.path.join(mcfg.model_path, "history.json"), "w") as f:
        json.dump(history, f)
    dt = time.time() - t_start
    print(f"Training complete: {it} iters in {dt:.1f}s "
          f"({it / max(dt, 1e-9):.2f} it/s), final loss {history[-1]['loss']:.5f}")
    return ts, history


if __name__ == "__main__":
    main()

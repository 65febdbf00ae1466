#!/usr/bin/env python
"""Batch novel-view rendering (the reference's render.py:24-65).

Renders train/test views of a trained model to
<model>/{train,test}/ours_<iter>/{renders,gt}/*.png plus depth/normal maps.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def save_png(path, arr_chw):
    from PIL import Image

    arr = np.asarray(arr_chw)
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr.squeeze()).save(path)


def render_set(model_path, name, iteration, views, state, bg, mcfg, pcfg, render_fn,
               save_depth=False):
    base = os.path.join(model_path, name, f"ours_{iteration}")
    rdir = os.path.join(base, "renders")
    gdir = os.path.join(base, "gt")
    os.makedirs(rdir, exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    for idx, (cam, gt, _) in enumerate(views):
        out = render_fn(state, cam, bg, kernel_size=mcfg.kernel_size,
                        max_per_tile=pcfg.max_per_tile)
        save_png(os.path.join(rdir, f"{idx:05d}.png"), out["render"])
        save_png(os.path.join(gdir, f"{idx:05d}.png"), gt)
        if save_depth:
            d = np.asarray(out["median_depth"][0])
            dn = d / max(d.max(), 1e-9)
            save_png(os.path.join(rdir, f"{idx:05d}_depth.png"), dn[None])
            save_png(os.path.join(rdir, f"{idx:05d}_normal.png"),
                     np.asarray(out["normal"]) * 0.5 + 0.5)
    print(f"{name}: wrote {len(views)} renders to {base}")


def main(argv=None):
    import jax.numpy as jnp

    from radegs_tpu.data.scene import Scene, search_max_iteration
    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.renderer import render_compiled as render_fn
    from radegs_tpu.train.arguments import add_group, get_combined_args, extract
    from radegs_tpu.train.config import ModelConfig, PipelineConfig

    p = argparse.ArgumentParser(description="radegs_tpu rendering")
    add_group(p, ModelConfig, "ModelParams")
    add_group(p, PipelineConfig, "PipelineParams")
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--save_depth", action="store_true")
    p.add_argument("--path_frames", type=int, default=0,
                   help="also render an N-frame ellipse orbit (video frames)")
    from radegs_tpu.utils.platform import add_device_arg, apply_device
    add_device_arg(p)
    args = get_combined_args(p, argv)
    apply_device(args.device)
    mcfg = extract(ModelConfig, args)
    pcfg = extract(PipelineConfig, args)

    pc_dir = os.path.join(mcfg.model_path, "point_cloud")
    iteration = args.iteration if args.iteration > 0 else search_max_iteration(pc_dir)
    state = gm.load_gaussian_ply(
        os.path.join(pc_dir, f"iteration_{iteration}", "point_cloud.ply"),
        sh_degree=mcfg.sh_degree,
    )

    scene = Scene(mcfg.source_path, model_path=None, images=mcfg.images,
                  eval_split=mcfg.eval, white_background=mcfg.white_background,
                  resolution=mcfg.resolution, shuffle=False)
    bg = jnp.ones(3) if mcfg.white_background else jnp.zeros(3)

    if not args.skip_train:
        render_set(mcfg.model_path, "train", iteration, scene.getTrainCameras(),
                   state, bg, mcfg, pcfg, render_fn, args.save_depth)
    if not args.skip_test and scene.getTestCameras():
        render_set(mcfg.model_path, "test", iteration, scene.getTestCameras(),
                   state, bg, mcfg, pcfg, render_fn, args.save_depth)
    if args.path_frames > 0:
        from radegs_tpu.utils.trajectories import ellipse_path, render_path

        cams = [c for c, _, _ in scene.getTrainCameras()]
        path = ellipse_path(cams, n_frames=args.path_frames)
        out = render_path(state, path, bg,
                          os.path.join(mcfg.model_path, f"video_{iteration}"),
                          kernel_size=mcfg.kernel_size,
                          max_per_tile=pcfg.max_per_tile, save_depth=args.save_depth)
        print(f"wrote orbit frames to {out}")


if __name__ == "__main__":
    main()

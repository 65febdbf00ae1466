#!/usr/bin/env python
"""Marching-Tetrahedra mesh extraction CLI (the reference's
mesh_extract_tetrahedra.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import jax.numpy as jnp

    from radegs_tpu.data.scene import Scene, search_max_iteration
    from radegs_tpu.mesh.extract_tetra import extract_mesh_tetrahedra
    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.train.arguments import add_group, extract, get_combined_args
    from radegs_tpu.train.config import ModelConfig, PipelineConfig

    p = argparse.ArgumentParser(description="Marching-Tetrahedra mesh extraction")
    add_group(p, ModelConfig, "ModelParams")
    add_group(p, PipelineConfig, "PipelineParams")
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--binary_steps", type=int, default=8)
    p.add_argument("--max_per_tile", type=int, default=1024)
    from radegs_tpu.utils.platform import add_device_arg, apply_device
    add_device_arg(p)
    args = get_combined_args(p, argv)
    apply_device(args.device)
    mcfg = extract(ModelConfig, args)

    pc_dir = os.path.join(mcfg.model_path, "point_cloud")
    iteration = (
        args.iteration
        if os.path.isdir(os.path.join(pc_dir, f"iteration_{args.iteration}"))
        else search_max_iteration(pc_dir)
    )
    state = gm.load_gaussian_ply(
        os.path.join(pc_dir, f"iteration_{iteration}", "point_cloud.ply"),
        sh_degree=mcfg.sh_degree,
    )
    print(f"loaded gaussians from iteration {iteration}")

    scene = Scene(mcfg.source_path, model_path=None, images=mcfg.images,
                  eval_split=False, white_background=mcfg.white_background,
                  resolution=mcfg.resolution, shuffle=False)
    bg = jnp.ones(3) if mcfg.white_background else jnp.zeros(3)
    extract_mesh_tetrahedra(
        state, scene.getTrainCameras(), kernel_size=mcfg.kernel_size, bg=bg,
        out_path=os.path.join(mcfg.model_path, "recon.ply"),
        n_binary_steps=args.binary_steps, max_per_tile=args.max_per_tile,
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""DTU mesh preparation + evaluation (the reference's evaluate_dtu_mesh.py):
Procrustes-align the reconstruction to the DTU calibration frame, cull by
foreground masks, then run the chamfer evaluation."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_dtu_camera_centers(dtu_dir, scan):
    """Camera centers from the DTU calibration (evaluate_dtu_mesh.py:60-76:
    Calibration/cal18/pos_*.txt projection matrices)."""
    cal = os.path.join(dtu_dir, "Calibration", "cal18")
    centers = []
    for i in range(1, 50):
        f = os.path.join(cal, f"pos_{i:03d}.txt")
        if not os.path.exists(f):
            break
        Pm = np.loadtxt(f)  # 3x4
        # camera center = -M^-1 p4
        centers.append(-np.linalg.inv(Pm[:, :3]) @ Pm[:, 3])
    return np.stack(centers)


def main(argv=None):
    from radegs_tpu.data.scene import Scene
    from radegs_tpu.eval.dtu import evaluate_dtu
    from radegs_tpu.eval.dtu_mesh import align_and_cull
    from radegs_tpu.train.arguments import add_group, extract, get_combined_args
    from radegs_tpu.train.config import ModelConfig

    p = argparse.ArgumentParser()
    add_group(p, ModelConfig, "ModelParams")
    p.add_argument("--DTU", type=str, required=True, help="DTU reference data dir")
    p.add_argument("--scan_id", type=int, required=True)
    p.add_argument("--mesh", type=str, default=None, help="default <model>/recon.ply")
    args = get_combined_args(p, argv)
    mcfg = extract(ModelConfig, args)

    mesh_path = args.mesh or os.path.join(mcfg.model_path, "recon.ply")
    scene = Scene(mcfg.source_path, model_path=None, images=mcfg.images,
                  eval_split=False, resolution=mcfg.resolution, shuffle=False)
    cams = scene.getTrainCameras()
    masks = [ci.mask for ci in scene.info.train_cameras]
    if all(m is None for m in masks):
        masks = None
    centers = load_dtu_camera_centers(args.DTU, args.scan_id)[: len(cams)]
    out_path = os.path.join(mcfg.model_path, "culled_mesh.ply")
    align_and_cull(mesh_path, cams, centers, masks=masks, out_path=out_path)
    print(f"aligned + culled mesh -> {out_path}")
    r = evaluate_dtu(out_path, args.scan_id, args.DTU,
                     out_dir=os.path.join(mcfg.model_path, "dtu_eval"))
    print(r)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Tanks & Temples F-score CLI (the reference's eval_tnt/run.py protocol)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    from radegs_tpu.eval.tnt import evaluate_tnt, read_trajectory_log
    from radegs_tpu.utils import ply as plyio

    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", type=str, required=True,
                   help="dir with <scene>.ply GT, <scene>_COLMAP_SfM.log, <scene>.json crop")
    p.add_argument("--traj_path", type=str, required=True,
                   help="estimated trajectory .log")
    p.add_argument("--ply_path", type=str, required=True, help="reconstruction .ply")
    p.add_argument("--scene", type=str, default=None)
    p.add_argument("--out_dir", type=str, default=".")
    args = p.parse_args(argv)

    scene = args.scene or os.path.basename(args.dataset_dir.rstrip("/"))
    est_pts, _, _ = plyio.read_point_cloud(args.ply_path)
    gt_pts, _, _ = plyio.read_point_cloud(os.path.join(args.dataset_dir, f"{scene}.ply"))
    gt_traj = read_trajectory_log(os.path.join(args.dataset_dir, f"{scene}_COLMAP_SfM.log"))
    est_traj = read_trajectory_log(args.traj_path)
    crop = os.path.join(args.dataset_dir, f"{scene}.json")
    r = evaluate_tnt(
        scene, est_pts.astype(np.float64), gt_pts.astype(np.float64),
        est_traj=est_traj, gt_traj=gt_traj,
        crop_json=crop if os.path.exists(crop) else None,
        out_dir=args.out_dir,
    )
    print(f"precision {r['precision']:.4f}  recall {r['recall']:.4f}  F1 {r['f1']:.4f}")


if __name__ == "__main__":
    main()

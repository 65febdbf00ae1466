#!/usr/bin/env python
"""DTU chamfer evaluation CLI (the reference's dtu_eval/eval.py protocol).

Requires the official DTU reference data (ObsMask/, Points/stl/) under
--dataset_dir. Writes results.json + colored error clouds.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    from radegs_tpu.eval.dtu import evaluate_dtu

    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True, help="reconstructed mesh .ply")
    p.add_argument("--scan", type=int, required=True)
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--vis_out_dir", type=str, default=".")
    p.add_argument("--downsample_density", type=float, default=0.2)
    p.add_argument("--patch_size", type=float, default=60)
    p.add_argument("--max_dist", type=float, default=20)
    p.add_argument("--visualize_threshold", type=float, default=10)
    args = p.parse_args(argv)
    r = evaluate_dtu(
        args.data, args.scan, args.dataset_dir, out_dir=args.vis_out_dir,
        downsample_density=args.downsample_density, patch_size=args.patch_size,
        max_dist=args.max_dist, visualize_threshold=args.visualize_threshold,
    )
    print(r["mean_d2s"], r["mean_s2d"], r["overall"])


if __name__ == "__main__":
    main()

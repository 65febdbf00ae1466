#!/usr/bin/env python
"""NVS metrics over dumped renders (the reference's metric.py:36-102).

Computes PSNR / SSIM (and LPIPS when torch weights are available locally)
over <model>/test/ours_<iter>/{renders,gt} and writes results.json +
per_view.json in the reference's format.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_dir(d):
    from PIL import Image

    names = sorted(f for f in os.listdir(d) if f.endswith(".png") and "_" not in f)
    return names, [
        np.asarray(Image.open(os.path.join(d, f)), dtype=np.float32).transpose(2, 0, 1)
        / 255.0
        for f in names
    ]


def try_lpips():
    """Prefer the in-repo JAX LPIPS (radegs_tpu.eval.lpips) when its
    converted weights npz exists; fall back to an external torch `lpips`
    install. Returns a callable (render01, gt01) -> float, or None.

    NOTE the two paths follow the reference protocol (metric.py:74): [0,1]
    images fed straight into the network's z-score, no [-1,1] rescale."""
    try:
        from radegs_tpu.eval.lpips import LPIPSMetric

        return LPIPSMetric()
    except FileNotFoundError:
        pass  # no weights npz shipped — expected in this image
    except Exception as e:
        # Anything else (corrupt/mismatched npz) must be VISIBLE: silently
        # switching LPIPS implementations changes published numbers.
        print(f"WARNING: in-repo JAX LPIPS failed ({type(e).__name__}: {e}); "
              "falling back to torch lpips", flush=True)
    try:
        import torch
        import lpips  # noqa: F401

        model = lpips.LPIPS(net="vgg")

        def score(r, g):
            with torch.no_grad():
                return float(model(torch.from_numpy(r[None]), torch.from_numpy(g[None])))

        return score
    except Exception:
        return None


def main(argv=None):
    import jax.numpy as jnp

    from radegs_tpu.ops.ssim import psnr as psnr_fn, ssim as ssim_fn

    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = p.parse_args(argv)

    lpips_model = try_lpips()
    for model_path in args.model_paths:
        print(f"Scene: {model_path}")
        full, per_view = {}, {}
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print("  no test renders; run scripts/render.py first")
            continue
        for method in sorted(os.listdir(test_dir)):
            names, renders = load_dir(os.path.join(test_dir, method, "renders"))
            _, gts = load_dir(os.path.join(test_dir, method, "gt"))
            ssims, psnrs, lpipss = [], [], []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r), jnp.asarray(g)
                ssims.append(float(ssim_fn(rj, gj)))
                psnrs.append(float(psnr_fn(rj, gj)))
                if lpips_model is not None:
                    lpipss.append(float(lpips_model(r, g)))
            print(f"  {method}: SSIM {np.mean(ssims):.7f}  PSNR {np.mean(psnrs):.7f}"
                  + (f"  LPIPS {np.mean(lpipss):.7f}" if lpipss else ""))
            full[method] = {
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
                **({"LPIPS": float(np.mean(lpipss))} if lpipss else {}),
            }
            per_view[method] = {
                "SSIM": dict(zip(names, ssims)),
                "PSNR": dict(zip(names, psnrs)),
                **({"LPIPS": dict(zip(names, lpipss))} if lpipss else {}),
            }
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


if __name__ == "__main__":
    main()

"""Convert torchvision VGG16 + official LPIPS v0.1 linear heads to the npz
consumed by radegs_tpu.eval.lpips.

Run this on a machine WITH network access (the build image has none):

    python scripts/convert_lpips_weights.py --out weights/lpips_vgg.npz

Sources (matching the reference's lpipsPyTorch exactly):
- VGG16 IMAGENET1K_V1 features (modules/networks.py:89)
- linear heads from richzhang/PerceptualSimilarity v0.1 vgg.pth
  (modules/utils.py:11-31)
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_vgg.npz")
    args = ap.parse_args()

    import numpy as np
    import torch

    try:
        from torchvision import models
    except ImportError as e:
        raise SystemExit(
            "torchvision is required (run on a machine with it installed + "
            f"network access): {e}"
        )

    vgg = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).features
    out = {}
    ci = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{ci}_w"] = m.weight.detach().numpy().astype(np.float32)
            out[f"conv{ci}_b"] = m.bias.detach().numpy().astype(np.float32)
            ci += 1
    assert ci == 13, ci

    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        "master/lpips/weights/v0.1/vgg.pth"
    )
    sd = torch.hub.load_state_dict_from_url(url, progress=True, map_location="cpu")
    # keys: lin0.model.1.weight .. lin4.model.1.weight, each (1, C, 1, 1)
    for k in range(5):
        w = sd[f"lin{k}.model.1.weight"].detach().numpy().astype(np.float32)
        out[f"lin{k}"] = w.reshape(-1)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()

"""Parity check of the Pallas phase-A integrate kernel (integrateCUDA's
image phase, forward.cu:938-1133) against ops.integrate.integrate_image.

    python scripts/_phase_a_draft.py            # interpret-mode parity (CPU)
    RUN_TPU=1 python scripts/_phase_a_draft.py  # compiled on the TPU
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if not os.environ.get("RUN_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp


def main():
    from radegs_tpu.core.camera import Camera
    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.binning import bin_gaussians
    from radegs_tpu.ops.integrate import integrate_image
    from radegs_tpu.ops.pallas_integrate import integrate_image_pallas

    rng = np.random.default_rng(7)
    P = 60
    W = H = 64
    cam = Camera.look_at([0, 0, -4.0], [0, 0, 0], [0, 1, 0], 0.8, 0.8, W, H)
    prep = preprocess_gaussians(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.8, jnp.float32),
        jnp.asarray(rng.uniform(0.05, 0.35, (P, 3)), jnp.float32),
        jnp.asarray(np.tile([1.0, 0, 0, 0], (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0.2, 0.95, (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (P, 1, 3)), jnp.float32),
        sh_degree=0, camera=cam, kernel_size=0.1,
    )
    b = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, W, H,
                      instance_budget=1 << 12, max_per_tile=128)
    bg = jnp.asarray([0.2, 0.4, 0.6], jnp.float32)
    nproj = jnp.zeros((H, W), jnp.int32)
    ref_color, ref_mid = integrate_image(prep, b, bg, nproj, width=W, height=H)
    # 16-lane chunks keep interpret fast; real hardware requires the
    # 128-aligned DMA windows the production default uses
    on_tpu = bool(os.environ.get("RUN_TPU"))
    out_color, mid = integrate_image_pallas(
        prep, b, bg, nproj, width=W, height=H, chunk=128 if on_tpu else 16,
        interpret=not on_tpu)

    okall = True
    for ch in range(9):
        err = np.abs(np.asarray(out_color[ch]) - np.asarray(ref_color[ch])).max()
        print(f"  ch{ch}: max err {err:.3e}")
        okall &= err < 1e-5
    for k in ("mid_dc", "mid_p0", "mid_p1", "mid_x", "mid_y"):
        err = np.abs(np.asarray(mid[k]) - np.asarray(ref_mid[k])).max()
        print(f"  {k}: max err {err:.3e}")
        okall &= err < 1e-5
    print("PARITY OK" if okall else "PARITY FAIL")
    sys.exit(0 if okall else 1)


if __name__ == "__main__":
    main()

"""Compile + run the blend kernels on the real TPU at a small size and
check parity against interpret mode (the on-device check ADVICE asked for).
Fast Mosaic-iteration loop: ~2-4 min vs ~15 for the full bench."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.binning import bin_gaussians
    from radegs_tpu.ops import pallas_blend as pb

    rng = np.random.default_rng(3)
    P = 2000
    W = H = 256
    cam = Camera.look_at([0, 0.3, -4.0], [0, 0, 0], [0, 1, 0], 0.9, 0.9, W, H)

    @jax.jit
    def prep_fn(xyz, scales, quat, op, feat):
        return preprocess_gaussians(xyz, scales, quat, op, feat, sh_degree=0,
                                    camera=cam, kernel_size=0.1)

    prep = prep_fn(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.9, jnp.float32),
        jnp.asarray(rng.uniform(0.02, 0.25, (P, 3)), jnp.float32),
        jnp.asarray(np.tile([1.0, 0, 0, 0], (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0.05, 0.95, (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (P, 1, 3)), jnp.float32),
    )

    @jax.jit
    def bin_fn(prep):
        sg = jax.lax.stop_gradient
        return bin_gaussians(
            sg(prep.xy), sg(prep.radius), sg(prep.depth), prep.valid, W, H,
            instance_budget=1 << 15, max_per_tile=512,
            conic=sg(prep.conic),
            opacity=sg(jnp.where(prep.valid, prep.opacity, 0.0)),
            need_tile_gauss=False)

    binning = jax.block_until_ready(bin_fn(prep))
    print(f"kept instances: {int(jnp.sum(binning.tile_count))}", flush=True)

    inputs = (prep.xy, prep.conic, jnp.where(prep.valid, prep.opacity, 0.0),
              prep.rgb, prep.view_point, prep.camera_plane, prep.ray_plane,
              prep.normal, prep.ts)

    fwd = jax.jit(functools_partial_fwd := (lambda b, inp: pb.blend_forward_pallas(
        b, *inp, width=W, height=H)))
    out_dev = jax.block_until_ready(fwd(binning, inputs))
    print("fwd compiled + ran", flush=True)

    cot = {k: (jnp.ones_like(v) if k != "med_pos" else None)
           for k, v in out_dev.items()}
    bwd = jax.jit(lambda b, inp, fo, c: pb.blend_backward_pallas(
        b, inp, fo, c, width=W, height=H))
    g_dev = jax.block_until_ready(bwd(binning, inputs, out_dev, cot))
    print("bwd compiled + ran", flush=True)

    # ---- on-device vs interpret parity ----
    fwd_i = jax.jit(lambda b, inp: pb.blend_forward_pallas(
        b, *inp, width=W, height=H, interpret=True))
    out_int = jax.block_until_ready(fwd_i(binning, inputs))
    for k in out_dev:
        a, b_ = np.asarray(out_dev[k]), np.asarray(out_int[k])
        if k == "med_pos":
            bad = (a != b_).mean()
            print(f"  fwd {k}: mismatch frac {bad:.2e}")
        else:
            err = np.abs(a - b_).max()
            print(f"  fwd {k}: max abs err {err:.3e}")

    bwd_i = jax.jit(lambda b, inp, fo, c: pb.blend_backward_pallas(
        b, inp, fo, c, width=W, height=H, interpret=True))
    g_int = jax.block_until_ready(bwd_i(binning, inputs, out_dev, cot))
    for k in g_dev:
        a, b_ = np.asarray(g_dev[k]), np.asarray(g_int[k])
        denom = np.abs(b_).max() + 1e-8
        err = np.abs(a - b_).max() / denom
        print(f"  bwd {k}: max rel err {err:.3e}")


if __name__ == "__main__":
    main()

"""Isolated timings of the blend kernels + their data-prep stages at bench
scale. Run with RADEGS_MM_PRECISION=highest|high|default to bracket the
in-kernel matmul fidelity cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.binning import bin_gaussians
    from radegs_tpu.ops import pallas_blend as pb

    print(f"precision={os.environ.get('RADEGS_MM_PRECISION', 'highest')}")
    state, cam, gt = bench.build_scene()
    scales, opacity = state.get_fused_scaling_opacity()
    opacity = jnp.where(state.active[:, None], opacity, 0.0)
    prep = preprocess_gaussians(
        state.params.xyz, scales, state.get_rotation(), opacity,
        state.get_features(), sh_degree=3, camera=cam, kernel_size=0.1,
        active_sh_degree=state.active_sh_degree,
    )
    prep = prep.replace(valid=prep.valid & state.active)
    W, H = bench.WIDTH, bench.HEIGHT
    sg = jax.lax.stop_gradient
    binning = jax.jit(lambda: bin_gaussians(
        sg(prep.xy), sg(prep.radius), sg(prep.depth), prep.valid, W, H,
        instance_budget=1 << 20, max_per_tile=512,
        conic=sg(prep.conic), opacity=sg(jnp.where(prep.valid, prep.opacity, 0.0)),
        need_tile_gauss=False))()
    binning = jax.block_until_ready(binning)
    print(f"instances: {int(binning.n_instances)}, culled: {int(binning.n_culled)}, "
          f"kept: {int(jnp.sum(binning.tile_count))}")

    inputs = (sg(prep.xy), sg(prep.conic), sg(jnp.where(prep.valid, prep.opacity, 0.0)),
              sg(prep.rgb), sg(prep.view_point), sg(prep.camera_plane),
              sg(prep.ray_plane), sg(prep.normal), sg(prep.ts))

    def timed(fn, x, iters=10, warmup=2):
        for _ in range(warmup):
            x = fn(x)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / iters

    import functools

    # pass all big arrays as jit ARGUMENTS — closures serialize into the
    # remote-compile request and blow its size limit (HTTP 413)
    @jax.jit
    def t_feat(bump, binning, inputs):
        inp = (inputs[0] + bump,) + tuple(inputs[1:])
        f = pb.sorted_features(binning, inp)
        return bump + jnp.sum(f) * 1e-20

    @jax.jit
    def t_fwd(bump, binning, inputs):
        out = pb.blend_forward_pallas(
            binning, inputs[0] + bump, *inputs[1:], width=W, height=H)
        return bump + out["weight"][:1, :1] * 1e-20

    fwd_out = jax.jit(
        lambda binning, inputs: pb.blend_forward_pallas(
            binning, *inputs, width=W, height=H)
    )(binning, inputs)
    fwd_out = jax.block_until_ready(fwd_out)
    cot = {k: (jnp.ones_like(v) if k != "med_pos" else None)
           for k, v in fwd_out.items()}

    @jax.jit
    def t_bwd(bump, binning, inputs, fwd_out, cot):
        inp = (inputs[0] + bump,) + tuple(inputs[1:])
        g = pb.blend_backward_pallas(binning, inp, fwd_out, cot, width=W, height=H)
        return bump + g["xy"][:1, :1] * 1e-20

    B_out = ((1 << 20) + 127) // 128 * 128 + 128  # rolling-compacted bound
    rng = np.random.default_rng(0)
    ginst = jnp.asarray(rng.normal(size=(32, B_out)).astype(np.float32))
    gids = jnp.asarray(rng.integers(0, 131072, B_out), jnp.int32)

    @jax.jit
    def t_scatter(bump, ginst, gids):
        acc = jnp.zeros((131072 + 1, 25), jnp.float32).at[gids].add(
            (ginst[:25] + bump).T)[:131072]
        return bump + acc[:1, :1] * 1e-20

    z = jnp.zeros((1, 2))
    z11 = jnp.zeros((1, 1))
    print(f"  sorted_features : {timed(functools.partial(t_feat, binning=binning, inputs=inputs), z)*1e3:7.2f} ms")
    print(f"  fwd pallas total: {timed(functools.partial(t_fwd, binning=binning, inputs=inputs), z)*1e3:7.2f} ms")
    print(f"  bwd pallas total: {timed(functools.partial(t_bwd, binning=binning, inputs=inputs, fwd_out=fwd_out, cot=cot), z)*1e3:7.2f} ms")
    print(f"  scatter (Bout,25): {timed(functools.partial(t_scatter, ginst=ginst, gids=gids), z11)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Dump the TPU-optimized HLO of the binning jit and summarize the largest
fusions (fusion.15 measured ~9 ms/iter in the trace)."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.binning import bin_gaussians

    state, cam, gt = bench.build_scene()
    scales, opacity = state.get_fused_scaling_opacity()
    opacity = jnp.where(state.active[:, None], opacity, 0.0)
    prep = preprocess_gaussians(
        state.params.xyz, scales, state.get_rotation(), opacity,
        state.get_features(), sh_degree=3, camera=cam, kernel_size=0.1,
        active_sh_degree=state.active_sh_degree,
    )
    prep = jax.block_until_ready(prep.replace(valid=prep.valid & state.active))
    W, H = bench.WIDTH, bench.HEIGHT
    sg = jax.lax.stop_gradient

    def bin_fn(xy, radius, depth, valid, conic, op):
        b = bin_gaussians(xy, radius, depth, valid, W, H,
                          instance_budget=1 << 20, max_per_tile=512,
                          conic=conic, opacity=op, need_tile_gauss=False)
        return (jnp.sum(b.gauss_id) + jnp.sum(b.tile_start)
                + jnp.sum(b.sorted_orig)).astype(jnp.float32)

    args = (sg(prep.xy), sg(prep.radius), sg(prep.depth), prep.valid,
            sg(prep.conic), sg(jnp.where(prep.valid, prep.opacity, 0.0)))
    compiled = jax.jit(bin_fn).lower(*args).compile()
    txt = compiled.as_text()
    with open("/tmp/bin_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped ({len(txt)} chars)")

    # list fusion computations and rough sizes
    for m in re.finditer(r"^(%?fused_\S+|ENTRY \S+|%?\S*fusion\S*) ", txt, re.M):
        pass
    # print every instruction named fusion.N in the entry with its operands
    for line in txt.splitlines():
        ls = line.strip()
        if re.match(r"%?fusion(\.\d+)? =", ls) or " sort(" in ls or " scatter" in ls \
           or " gather(" in ls or "all-reduce" in ls:
            print(ls[:220])


if __name__ == "__main__":
    main()

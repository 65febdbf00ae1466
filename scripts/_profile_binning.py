"""Capture a jax.profiler trace of the binning jit + the full train step,
then print the top XLA ops by self time (parses the perfetto trace json)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def top_ops(trace_dir, n=25):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace files under", trace_dir)
        return
    dur = defaultdict(float)
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            pid_name = ev.get("pid")
            name = ev.get("name", "?")
            # keep device lanes only (heuristic: XLA op names contain '.' or fusion)
            dur[name] += ev["dur"]
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:n]:
        print(f"  {d/1e3:9.2f} ms  {name[:110]}")


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

    @jax.jit
    def bin_fn(xy, radius, depth, valid, conic, op):
        b = bin_gaussians(xy, radius, depth, valid, W, H,
                          instance_budget=1 << 20, max_per_tile=512,
                          conic=conic, opacity=op, need_tile_gauss=False)
        return (jnp.sum(b.gauss_id) + jnp.sum(b.tile_start)
                + jnp.sum(b.sorted_orig)).astype(jnp.float32)

    args = (sg(prep.xy), sg(prep.radius), sg(prep.depth), prep.valid,
            sg(prep.conic), sg(jnp.where(prep.valid, prep.opacity, 0.0)))
    out = bin_fn(*args)
    jax.block_until_ready(out)

    tdir = "/tmp/bin_trace"
    with jax.profiler.trace(tdir):
        o = 0.0
        for _ in range(5):
            o = bin_fn(args[0] + o * 1e-20, *args[1:])
        jax.block_until_ready(o)
    print("=== top ops, binning x5 ===", flush=True)
    top_ops(tdir)


if __name__ == "__main__":
    main()

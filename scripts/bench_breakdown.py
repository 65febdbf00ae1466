"""Per-stage timing breakdown of the train step (SURVEY.md §5.1 harness).

Times cumulative pipeline prefixes (preprocess | +binning | +forward blend |
+loss tail | +backward | full step) with chained jitted calls — each
iteration's input is perturbed by the previous output's scalar, so the chain
cannot be deduplicated or overlapped — and reports per-stage deltas.

Standalone micro-benchmarks of single ops are unreliable through the TPU
tunnel (results can be cached); chained prefixes with ONE final fetch is the
method CLAUDE.md prescribes. Stage cost = difference of adjacent prefixes
(noise ~1-2 ms, so small stages are indicative only).

Usage: python scripts/bench_breakdown.py [--iters 10] [--trace DIR]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--trace", type=str, default=None,
                    help="capture a jax.profiler trace of the full step to DIR")
    ap.add_argument("--scene", choices=["100k", "dense"], default="100k")
    ap.add_argument("--budget", type=int, default=0,
                    help="explicit instance budget (0 = capacity * "
                         "multiplier; pass the bench --auto settled value "
                         "so the breakdown prices like the real step)")
    ap.add_argument("--mpt", type=int, default=0,
                    help="max_per_tile override (0 = scene default)")
    args = ap.parse_args()

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench  # reuse the headline scene builder
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.binning import bin_gaussians, default_instance_budget
    from radegs_tpu.ops import rasterize as rz
    from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig
    from radegs_tpu.train.loop import compute_loss, init_train_state, make_train_step

    W, H = bench.WIDTH, bench.HEIGHT
    state, cam, gt = bench.build_scene(scene=args.scene)
    ts0 = init_train_state(state, jax.random.PRNGKey(0))
    bg = jnp.zeros(3)
    mcfg = ModelConfig(kernel_size=0.1)
    ocfg = OptimizationConfig(regularization_from_iter=0)
    mpt = args.mpt or (512 if args.scene == "100k" else 4096)
    budget = args.budget or min(
        default_instance_budget(state.capacity, 8), 1 << 24)
    pcfg = PipelineConfig(max_per_tile=mpt, instance_budget=budget)

    def prep_of(g):
        scales, opacity = g.get_fused_scaling_opacity()
        opacity = jnp.where(g.active[:, None], opacity, 0.0)
        prep = preprocess_gaussians(
            g.params.xyz, scales, g.get_rotation(), opacity, g.get_features(),
            sh_degree=g.max_sh_degree, camera=cam, kernel_size=mcfg.kernel_size,
            active_sh_degree=g.active_sh_degree,
        )
        return prep.replace(valid=prep.valid & g.active)

    def binning_of(prep):
        # mirror rasterize()'s call: precise culling on, no tile_gauss
        # (the Pallas path reads the flat layout only), blend features
        # riding the expansion + sort (so "+binning" includes the pack and
        # "+pack/align" measures only the residual _pad_lanes)
        on_tpu = jax.default_backend() == "tpu"
        features = None
        if on_tpu:
            from radegs_tpu.ops.pallas_blend import feature_rows

            features = jax.lax.stop_gradient(feature_rows((
                prep.xy, prep.conic,
                jnp.where(prep.valid, prep.opacity, 0.0), prep.rgb,
                prep.view_point, prep.camera_plane, prep.ray_plane,
                prep.normal, prep.ts)))
        return bin_gaussians(
            jax.lax.stop_gradient(prep.xy), jax.lax.stop_gradient(prep.radius),
            jax.lax.stop_gradient(prep.depth), prep.valid, W, H,
            instance_budget=budget, max_per_tile=pcfg.max_per_tile,
            conic=jax.lax.stop_gradient(prep.conic),
            opacity=jax.lax.stop_gradient(jnp.where(prep.valid, prep.opacity, 0.0)),
            need_tile_gauss=not on_tpu,
            features=features,
        )

    # ---- cumulative prefixes; each returns ONE scalar used to perturb the
    # next call's input (forces a serial chain on device)
    @jax.jit
    def p_preprocess(g):
        prep = prep_of(g)
        return jnp.sum(prep.xy) * 1e-20 + jnp.sum(prep.depth) * 1e-20

    def live_binning_sum(b):
        """Consume EXACTLY the binning outputs the kernels read (the live
        boundary set of the full pipeline: tile ranges + the id/pack the
        feature path needs) — nothing more, nothing less. Prefixes that
        consume a different set measure a different DCE'd program and their
        deltas are not stage costs (VERDICT r4 #7: the standalone
        '+binning' prefix measured ABOVE the pack-inclusive one)."""
        s = (jnp.sum(b.tile_start) + jnp.sum(b.tile_count)).astype(jnp.float32)
        if b.feat_pack is not None:
            s = s + jnp.sum(b.feat_pack)
        else:
            s = s + jnp.sum(b.gauss_id).astype(jnp.float32)
        return s * 1e-20

    @jax.jit
    def p_binning(g):
        prep = prep_of(g)
        b = binning_of(prep)
        return live_binning_sum(b)

    @jax.jit
    def p_pack(g):
        from radegs_tpu.ops.pallas_blend import packed_or_sorted_features

        prep = prep_of(g)
        b = binning_of(prep)
        inputs = (prep.xy, prep.conic, jnp.where(prep.valid, prep.opacity, 0.0),
                  prep.rgb, prep.view_point, prep.camera_plane, prep.ray_plane,
                  prep.normal, prep.ts)
        feat_sorted = packed_or_sorted_features(b, inputs)
        # the kernel's live set at this cut: the FULL pack + tile ranges
        return (jnp.sum(feat_sorted)
                + jnp.sum(b.tile_start).astype(jnp.float32)
                + jnp.sum(b.tile_count).astype(jnp.float32)) * 1e-20

    @jax.jit
    def p_blend_fwd(g):
        prep = prep_of(g)
        b = binning_of(prep)
        cfg = rz.RasterCfg(width=W, height=H, backend=(
            "pallas" if jax.default_backend() == "tpu" else "xla"))
        inputs = (prep.xy, prep.conic, jnp.where(prep.valid, prep.opacity, 0.0),
                  prep.rgb, prep.view_point, prep.camera_plane, prep.ray_plane,
                  prep.normal, prep.ts)
        raw = rz._forward_dispatch(cfg, b, inputs)
        return jnp.sum(raw["color_raw"]) * 1e-20

    def _fwd_and_cot(g):
        prep = prep_of(g)
        b = binning_of(prep)
        cfg = rz.RasterCfg(width=W, height=H, backend=(
            "pallas" if jax.default_backend() == "tpu" else "xla"))
        inputs = (prep.xy, prep.conic, jnp.where(prep.valid, prep.opacity, 0.0),
                  prep.rgb, prep.view_point, prep.camera_plane, prep.ray_plane,
                  prep.normal, prep.ts)
        fwd = rz._forward_dispatch(cfg, b, inputs)
        cot = {k: jnp.ones_like(v) for k, v in fwd.items() if k != "med_pos"}
        return b, inputs, fwd, cot

    @jax.jit
    def p_bwd_kernel(g):
        # blend backward KERNEL only (per-instance gradient block, no
        # transpose/segment reduction)
        from radegs_tpu.ops.pallas_blend import blend_backward_pallas

        b, inputs, fwd, cot = _fwd_and_cot(g)
        raw = blend_backward_pallas(b, inputs, fwd, cot, width=W, height=H,
                                    reduce=False)["raw"]
        return jnp.sum(raw) * 1e-20

    @jax.jit
    def p_bwd_blend(g):
        # + the instance->gaussian reduction (segmented scatter-add — the
        # measured winner; the sort-based alternatives were removed in r5,
        # see ops/pallas_blend.blend_backward_pallas)
        from radegs_tpu.ops.pallas_blend import blend_backward_pallas

        b, inputs, fwd, cot = _fwd_and_cot(g)
        grads = blend_backward_pallas(b, inputs, fwd, cot, width=W, height=H)
        return sum(jnp.sum(v) for v in grads.values()) * 1e-20

    @jax.jit
    def p_fwd_loss(g):
        loss, aux = compute_loss(
            g, None, jnp.zeros((g.capacity, 2)), jnp.zeros((g.capacity, 2)),
            cam, gt, bg, jnp.asarray(1, jnp.int32), mcfg, ocfg, pcfg)
        return loss * 1e-20

    @jax.jit
    def p_grads(g):
        zeros2 = jnp.zeros((g.capacity, 2))

        def loss_fn(params, xy_offset, xy_abs):
            gg = g.replace(params=params)
            return compute_loss(gg, None, xy_offset, xy_abs, cam, gt, bg,
                                jnp.asarray(1, jnp.int32), mcfg, ocfg, pcfg)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(g.params, zeros2, zeros2)
        return (loss + sum(jnp.sum(x) for x in jax.tree.leaves(grads))) * 1e-20

    step = make_train_step(mcfg, ocfg, pcfg, spatial_lr_scale=5.0)

    def time_prefix(fn, name):
        g = ts0.gaussians
        bump = 0.0
        for _ in range(args.warmup):
            bump = fn(g.replace(params=g.params.replace(
                xyz=g.params.xyz + bump)))
            float(bump)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            bump = fn(g.replace(params=g.params.replace(
                xyz=g.params.xyz + bump)))
        float(bump)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {name:18s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    def time_full():
        ts = ts0
        for _ in range(args.warmup):
            ts, m = step(ts, cam, gt, bg, 0, W, H)
            float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            ts, m = step(ts, cam, gt, bg, 0, W, H)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {'full step':18s} {dt * 1e3:8.2f} ms", flush=True)
        return ts, dt

    print("cumulative prefixes:", flush=True)
    t_pre = time_prefix(p_preprocess, "preprocess")
    t_bin = time_prefix(p_binning, "+binning")
    t_pack = time_prefix(p_pack, "+pack/align")
    t_fwd = time_prefix(p_blend_fwd, "+blend fwd")
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        t_bk = time_prefix(p_bwd_kernel, "+bwd kernel")
        t_bb = time_prefix(p_bwd_blend, "+bwd reduce")
    t_loss = time_prefix(p_fwd_loss, "+loss tail")
    t_bwd = time_prefix(p_grads, "+backward")
    ts_run, t_full = time_full()

    stages = {
        "preprocess": t_pre,
        "binning": t_bin - t_pre,
        "pack_align": t_pack - t_bin,
        "blend_fwd": t_fwd - t_pack,
        "loss_tail": t_loss - t_fwd,
        "backward": t_bwd - t_loss,
        "adam_stats": t_full - t_bwd,
        "full": t_full,
    }
    if on_tpu:
        stages["bwd_kernel_only"] = t_bk - t_fwd
        stages["bwd_reduction"] = t_bb - t_bk
    print(json.dumps({k: round(v * 1e3, 2) for k, v in stages.items()}))

    if args.trace:
        with jax.profiler.trace(args.trace):
            ts = ts_run
            for _ in range(3):
                ts, m = step(ts, cam, gt, bg, 0, W, H)
            float(m["loss"])
        print(f"trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()

"""Chained timing of bin_gaussians' internal stages at bench scale.

Builds the real bench scene's preprocess outputs, then times cumulative
prefixes of the binning pipeline (rects -> expand -> cull -> sort ->
ranges) the same way scripts/bench_breakdown.py does."""
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
    from radegs_tpu.ops import binning as bn

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
    B = 1 << 20
    K = 512
    P = state.capacity
    tiles_x, tiles_y = bn.tile_grid(W, H)
    num_tiles = tiles_x * tiles_y

    op = jax.lax.stop_gradient(jnp.where(prep.valid, prep.opacity, 0.0))
    con = jax.lax.stop_gradient(prep.conic)
    xy = jax.lax.stop_gradient(prep.xy)
    radius = jax.lax.stop_gradient(prep.radius)
    depth = jax.lax.stop_gradient(prep.depth)
    valid = prep.valid

    def stage(level):
        def fn(bump):
            xyb = xy + bump
            tau = jnp.maximum(2.0 * jnp.log(jnp.maximum(op, 1e-12) / (1 / 255.0)), 0.0)
            a, b_, c = con[:, 0], con[:, 1], con[:, 2]
            det = jnp.maximum(a * c - b_ * b_, 1e-24)
            ex = jnp.minimum(jnp.sqrt(tau * c / det), radius)
            ey = jnp.minimum(jnp.sqrt(tau * a / det), radius)
            rx_min, ry_min, w, h, touched = bn.gaussian_rects(
                xyb, radius, tiles_x, tiles_y, extent_x=ex, extent_y=ey)
            alive = valid & (radius > 0) & (touched > 0)
            touched = jnp.where(alive, touched, 0)
            offsets = jnp.cumsum(touched) - touched
            total = offsets[-1] + touched[-1]
            if level == 0:
                return jnp.sum(offsets) * 1e-20 + total * 1e-20
            depth_key = jnp.where(alive, depth, jnp.inf)
            depth_order = jnp.argsort(depth_key)
            rank = jnp.zeros((P,), jnp.int32).at[depth_order].set(
                jnp.arange(P, dtype=jnp.int32))
            starts = jnp.where(alive & (offsets < B), offsets, B)
            ones = jnp.zeros((B + 1,), jnp.int32).at[starts].add(1)
            owner = jnp.cumsum(ones[:-1]) - 1
            alive_ids = jnp.nonzero(alive, size=P, fill_value=P - 1)[0].astype(jnp.int32)
            slot_valid = jnp.arange(B) < jnp.minimum(total, B)
            packed = jnp.stack(
                [alive_ids, offsets[alive_ids], jnp.maximum(w[alive_ids], 1),
                 rx_min[alive_ids], ry_min[alive_ids], rank[alive_ids]], axis=1)
            slot = packed[jnp.clip(owner, 0, P - 1)]
            gid = jnp.where(slot_valid, slot[:, 0], -1)
            within = jnp.arange(B, dtype=jnp.int32) - slot[:, 1]
            q = jnp.floor((within.astype(jnp.float32) + 0.5)
                          / slot[:, 2].astype(jnp.float32)).astype(jnp.int32)
            ty = slot[:, 4] + q
            tx = slot[:, 3] + within - q * slot[:, 2]
            tid = jnp.where(slot_valid, ty * tiles_x + tx, num_tiles)
            if level == 1:
                return jnp.sum(tid) * 1e-20 + jnp.sum(gid) * 1e-20
            packed_f = jnp.stack(
                [xyb[alive_ids, 0], xyb[alive_ids, 1], a[alive_ids], b_[alive_ids],
                 c[alive_ids], tau[alive_ids]], axis=1)
            slotf = packed_f[jnp.clip(owner, 0, P - 1)]
            x0 = (tx * 16).astype(jnp.float32)
            y0 = (ty * 16).astype(jnp.float32)
            qmin = bn._q_min_over_rect(
                slotf[:, 0], slotf[:, 1], slotf[:, 2], slotf[:, 3], slotf[:, 4],
                x0, x0 + 15.0, y0, y0 + 15.0)
            keep = qmin <= slotf[:, 5] * (1.0 + 1e-5) + 1e-6
            tid2 = jnp.where(keep, tid, num_tiles)
            if level == 2:
                return jnp.sum(tid2) * 1e-20
            sort_rank = jnp.where(tid2 < num_tiles, slot[:, 5], P)
            tid_s, _, gid_s, orig_s = jax.lax.sort(
                (tid2, sort_rank, gid, jnp.arange(B, dtype=jnp.int32)), num_keys=2)
            if level == 3:
                return jnp.sum(gid_s) * 1e-20
            hist = jnp.zeros((num_tiles + 1,), jnp.int32).at[tid_s].add(1)[:num_tiles]
            tile_start = (jnp.cumsum(hist) - hist).astype(jnp.int32)
            if level == 4:
                return (jnp.sum(tile_start) + jnp.sum(gid_s)) * 1e-20
        return jax.jit(fn)

    names = ["rects+cumsum", "+expand", "+cull", "+sort", "+hist/ranges"]
    prev = None
    for lv, nm in enumerate(names):
        fn = stage(lv)
        bump = jnp.zeros((1, 2))
        for _ in range(2):
            bump = fn(bump) + jnp.zeros((1, 2))
        jax.block_until_ready(bump)
        t0 = time.perf_counter()
        for _ in range(10):
            bump = fn(bump) + jnp.zeros((1, 2))
        jax.block_until_ready(bump)
        dt = (time.perf_counter() - t0) / 10
        d = "" if prev is None else f"  (stage {1e3 * (dt - prev):+.2f} ms)"
        print(f"{nm:14s} {dt * 1e3:8.2f} ms{d}", flush=True)
        prev = dt


if __name__ == "__main__":
    main()

"""Chained timing of bin_gaussians' internal stages + redesign primitives.

Part 1 — attribution: the real bench scene's preprocess outputs through
cumulative prefixes of the CURRENT binning pipeline (rects -> expand
gather -> cull -> sentinel sort -> s_pos ranges -> pack), bench scale.

Part 2 — redesign primitives at dense scale (synthetic, B=6M, P=1M):
isolates each suspect (target-scaled scatters, dump-row scatter, monotone
gather, wide-payload sort, merge-sort owner trick) so the round-4 binning
redesign (sort/scan-only scheduling, pack rides the sort) is chosen on
measured numbers. All timings use the chained-input methodology
(CLAUDE.md): each rep consumes the previous rep's output.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(name, fn, *args, reps=10, warm=2):
    """Chained timing: fn must map (carry, *args) -> carry-compatible."""
    import jax

    carry = args[0]
    rest = args[1:]
    for _ in range(warm):
        carry = fn(carry, *rest)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = fn(carry, *rest)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def part1_attribution():
    import bench
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops import binning as bn
    from radegs_tpu.ops.pallas_blend import sorted_features

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

    op = jax.lax.stop_gradient(jnp.where(prep.valid, prep.opacity, 0.0))
    inputs = tuple(jax.lax.stop_gradient(x) for x in (
        prep.xy, prep.conic, op, prep.rgb, prep.view_point,
        prep.camera_plane, prep.ray_plane, prep.normal, prep.ts))

    def stage(level):
        def fn(bump):
            binning = bn.bin_gaussians(
                prep.xy + bump, prep.radius, prep.depth, prep.valid,
                W, H, instance_budget=B, max_per_tile=4096,
                conic=prep.conic, opacity=op, need_tile_gauss=False,
            )
            if level == 0:
                return (jnp.sum(binning.tile_count) * 1e-20)[None, None]
            feat = sorted_features(binning, inputs, seg_rows=None)
            return (jnp.sum(feat[24]) * 1e-20)[None, None]
        return jax.jit(fn)

    print("== part 1: current full binning (bench scene, B=1M) ==", flush=True)
    timed("bin_gaussians (current)", lambda b: stage(0)(b) + jnp.zeros((1, 2)),
          jnp.zeros((1, 2)))
    timed("bin_gaussians + pack (current)", lambda b: stage(1)(b) + jnp.zeros((1, 2)),
          jnp.zeros((1, 2)))


def part2_primitives():
    import jax
    import jax.numpy as jnp

    print("== part 2: redesign primitives (dense scale) ==", flush=True)
    B = int(os.environ.get("MB_B", 6 * (1 << 20)))  # dense settled budget
    P = int(os.environ.get("MB_P", 1 << 20))        # gaussians
    T = int(os.environ.get("MB_T", 7500))           # 100x75 tiles
    rng = np.random.default_rng(0)

    # P sorted run starts covering [0, B_real), B_real ~ 0.8 B
    B_real = int(0.8 * B)
    touched = rng.integers(1, 12, P)
    touched = (touched * (B_real / touched.sum())).astype(np.int64)
    starts_np = np.cumsum(touched) - touched
    starts = jnp.asarray(np.minimum(starts_np, B).astype(np.int32))
    table12 = jnp.asarray(rng.normal(size=(P, 12)).astype(np.float32))
    table27 = jnp.asarray(rng.normal(size=(P, 27)).astype(np.float32))
    # monotone owner (the expand index): searchsorted on host for the fixture
    owner_np = np.searchsorted(starts_np, np.arange(B), side="right") - 1
    owner = jnp.asarray(np.clip(owner_np, 0, P - 1).astype(np.int32))
    # tile ids: ~B_real real rows over T tiles + dump tail (like post-cull)
    tid_np = np.concatenate([
        np.sort(rng.integers(0, T, B_real)).astype(np.int32),
        np.full(B - B_real, T, np.int32)])
    tid = jnp.asarray(tid_np)
    fcols = tuple(jnp.asarray(rng.normal(size=B).astype(np.float32))
                  for _ in range(26))

    # (a) scatter-of-ones into B+1 target (current owner trick, P rows)
    def ones_scatter(c, s):
        return jnp.zeros((B + 1,), jnp.int32).at[s].add(1) + c[:1].astype(jnp.int32)
    timed("(a) ones scatter P->B target", ones_scatter, fcols[0], starts)

    # (b) cumsum over B int32
    def big_cumsum(c, t):
        return jnp.cumsum(t + c[:1].astype(jnp.int32)).astype(jnp.float32)
    timed("(b) cumsum B int32", big_cumsum, fcols[0], tid)

    # (c/d) monotone row gather from (P, k) tables
    def mono_gather12(c, o):
        out = table12[o] + c[:1]
        return out.sum(axis=1)
    timed("(c) monotone gather (P,12)->B", mono_gather12, fcols[0], owner)

    def mono_gather27(c, o):
        out = table27[o] + c[:1]
        return out.sum(axis=1)
    timed("(d) monotone gather (P,27)->B", mono_gather27, fcols[0], owner)

    # (e) current s_pos ranges: scatter B+T rows into T+1 table, most rows
    # aimed at the dump row (the suspected catastrophic serializer)
    def spos_scatter(c, t):
        flag = t < T  # stand-in for the sentinel flag pattern
        cum = jnp.cumsum(flag.astype(jnp.int32))
        idx = jnp.where(flag, jnp.minimum(cum - 1, T - 1), T)
        s_pos = jnp.zeros((T + 1,), jnp.int32).at[idx].set(
            jnp.arange(B, dtype=jnp.int32))[:T]
        return s_pos.astype(jnp.float32) + c[:T]
    timed("(e) s_pos dump-row scatter", spos_scatter, fcols[0][:T], tid)

    # (f) sort-based ranges: key = tid with sentinels, payload = arange;
    # positions of the T sentinels = first T rows of the compaction sort
    def sort_ranges(c, t):
        flag = (t >= T).astype(jnp.int32)  # stand-in sentinel flag
        _, pos = jax.lax.sort((flag, jnp.arange(B, dtype=jnp.int32)),
                              num_keys=1, is_stable=True)
        return pos[:T].astype(jnp.float32) + c[:T]
    timed("(f) sort-based ranges", sort_ranges, fcols[0][:T], tid)

    # (g) the full 1-key + 26-payload instance sort at dense B.
    # EVERY output must be consumed: returning only out[1] lets XLA drop
    # the other 25 payload columns from the sort entirely (this DCE is
    # exactly what made scripts/_micro_sort.py's round-4 "sorts are free"
    # numbers bogus — it returned 2 of 27 outputs).
    def sort27(c, t, cols):
        ops = (t,) + (cols[0] + c[:1].astype(jnp.float32) * 1e-20,) + cols[1:]
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return sum(o if o.dtype == jnp.float32 else o.astype(jnp.float32)
                   for o in out)
    timed("(g) sort 1key+26payload @6M", sort27, fcols[0], tid, fcols)

    # (h) merge-sort owner: sort B+P merged positions, cumsum tags,
    # compact back the slot rows (second sort)
    def merge_owner(c, s):
        key = jnp.concatenate([s * 2 + 1, jnp.arange(B, dtype=jnp.int32) * 2])
        tag = jnp.concatenate([jnp.ones((P,), jnp.int32),
                               jnp.zeros((B,), jnp.int32)])
        key_s, tag_s = jax.lax.sort((key, tag), num_keys=1, is_stable=True)
        own = jnp.cumsum(tag_s) - 1
        _, own_slots = jax.lax.sort(
            (tag_s * (B + P) + jnp.cumsum(1 - tag_s), own), num_keys=1,
            is_stable=True)
        return own_slots[:B].astype(jnp.float32) * 1e-20 + c
    timed("(h) merge-sort owner (B+P)", merge_owner, fcols[0], starts)

    # (i) pack assembly: stack 27 (B,) columns -> (32, B) padded block
    # (sum over rows so DCE cannot drop any column's movement)
    def stack_pack(c, cols):
        rows = jnp.stack(cols + (cols[0] + c[:1],), axis=0)  # (27, B)
        return jnp.sum(jnp.pad(rows, ((0, 5), (0, 0))), axis=0)
    timed("(i) stack 27 cols -> (32,B)", stack_pack, fcols[0], fcols)


def part3_dense_pipeline():
    """Composed-pipeline attribution at DENSE shapes: an inline replica of
    the current bin_gaussians (owner-merge + segmented expand + exact cull +
    sentinel sort + compaction ranges [+ legacy pack | + riding pack]) with
    cumulative levels, on synthetic inputs shaped like the dense bench
    (P=2M capacity, ~1M alive, ~8M instances, B=16M budget). The isolated
    primitives (part 2) measured ALL cheap while the production dense
    binning bar is ~840 ms — this finds the composition cost."""
    import jax
    import jax.numpy as jnp

    from radegs_tpu.ops import binning as bn

    B = int(os.environ.get("MB3_B", 16 * (1 << 20)))
    P = int(os.environ.get("MB3_P", 1 << 21))
    W, H = 1600, 1200
    tiles_x, tiles_y = bn.tile_grid(W, H)
    num_tiles = tiles_x * tiles_y
    seg = 1 << 21
    rng = np.random.default_rng(0)

    alive_frac = 0.52
    alive = jnp.asarray(rng.random(P) < alive_frac)
    # screen positions + radii tuned to ~8M instances: mean touched ~7.6
    xy = jnp.asarray(
        np.stack([rng.uniform(0, W, P), rng.uniform(0, H, P)], 1).astype(np.float32))
    radius = jnp.asarray((rng.gamma(2.0, 11.0, P) + 2).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 8.0, P).astype(np.float32))
    # PD conics roughly matching the radii
    s2 = (radius / 3.0) ** 2
    a = jnp.asarray((1.0 / np.maximum(np.asarray(s2), 1e-3)
                     * rng.uniform(0.7, 1.3, P)).astype(np.float32))
    c = jnp.asarray((1.0 / np.maximum(np.asarray(s2), 1e-3)
                     * rng.uniform(0.7, 1.3, P)).astype(np.float32))
    b = jnp.asarray((np.sqrt(np.asarray(a * c)) * rng.uniform(-0.4, 0.4, P)
                     ).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.1, 0.95, P).astype(np.float32))
    feat24 = jnp.asarray(rng.normal(size=(P, 24)).astype(np.float32))

    def pipeline(bump, level, pack):
        xyb = xy + bump[0, 0]
        tau = jnp.maximum(2.0 * jnp.log(jnp.maximum(op, 1e-12) * 255.0), 0.0)
        det = jnp.maximum(a * c - b * b, 1e-24)
        ex = jnp.minimum(jnp.sqrt(tau * c / det), radius)
        ey = jnp.minimum(jnp.sqrt(tau * a / det), radius)
        rx_min, ry_min, w, h, touched = bn.gaussian_rects(
            xyb, radius, tiles_x, tiles_y, extent_x=ex, extent_y=ey)
        live = alive & (radius > 0) & (touched > 0)
        touched_m = jnp.where(live, touched, 0)
        depth_key = jnp.where(live, depth, jnp.inf)
        perm = jnp.argsort(depth_key)
        touched_p = touched_m[perm]
        alive_p = live[perm]
        offsets_p = jnp.cumsum(touched_p) - touched_p
        total = offsets_p[-1] + touched_p[-1]
        if level == 0:
            return (total + jnp.sum(offsets_p)).astype(jnp.float32)[None, None] * 1e-20
        starts = jnp.where(offsets_p < B, offsets_p, B).astype(jnp.int32)
        owner = bn._owner_merge(starts, B)
        if level == 1:
            return jnp.sum(owner).astype(jnp.float32)[None, None] * 1e-20
        # production pattern: elementwise stack in original order + ONE
        # (P, k) row gather by perm (replaces ~13 P-sized scalar gathers)
        wf = jnp.maximum(w, 1).astype(jnp.float32)
        orig_cols = [wf, rx_min.astype(jnp.float32), ry_min.astype(jnp.float32), tau]
        orig = jnp.stack(orig_cols, axis=1)
        if pack == "ride":
            orig = jnp.concatenate([orig, feat24], axis=1)
        packed = jnp.concatenate(
            [perm.astype(jnp.float32)[:, None],
             offsets_p.astype(jnp.float32)[:, None], orig[perm]], axis=1)
        cull_ix = dict(cx=None, cy=None)  # read from feat or dedicated cols
        total_capped = jnp.minimum(total, B)

        parts = []
        for s0 in range(0, B, seg):
            s1 = min(s0 + seg, B)
            n = s1 - s0

            def live_seg(_, s0=s0, s1=s1, n=n):
                sl_idx = jnp.arange(s0, s1, dtype=jnp.int32)
                sp = packed[jnp.clip(owner[s0:s1], 0, P - 1)]
                sl = sp[:, :5].astype(jnp.int32)
                svalid = sl_idx < total_capped
                g = jnp.where(svalid, sl[:, 0], -1)
                within = sl_idx - sl[:, 1]
                qd = jnp.floor((within.astype(jnp.float32) + 0.5) / sp[:, 2]).astype(jnp.int32)
                ty = sl[:, 4] + qd
                tx = sl[:, 3] + within - qd * sl[:, 2]
                t = jnp.where(svalid, ty * tiles_x + tx, num_tiles)
                if level >= 3:
                    if pack == "ride":
                        cx, cy, aa, bb, cc = (sp[:, 6], sp[:, 7], sp[:, 8],
                                              sp[:, 9], sp[:, 10])
                    else:
                        # legacy carries no cull floats here; gather ad hoc
                        cx, cy = xyb[sl[:, 0], 0], xyb[sl[:, 0], 1]
                        aa, bb, cc = a[sl[:, 0]], b[sl[:, 0]], c[sl[:, 0]]
                    x0 = (tx * 16).astype(jnp.float32)
                    y0 = (ty * 16).astype(jnp.float32)
                    qmin = bn._q_min_over_rect(cx, cy, aa, bb, cc,
                                               x0, x0 + 15.0, y0, y0 + 15.0)
                    keep = qmin <= sp[:, 5] * (1.0 + 1e-5) + 1e-6
                    t = jnp.where(keep, t, num_tiles)
                f = sp[:, 6:] if pack == "ride" else jnp.zeros((n, 0), jnp.float32)
                f = jnp.where(svalid[:, None], f, 0.0)
                return t, g, f

            def dead_seg(_, n=n):
                k = 24 if pack == "ride" else 0
                return (jnp.full((n,), num_tiles, jnp.int32),
                        jnp.full((n,), -1, jnp.int32),
                        jnp.zeros((n, k), jnp.float32))

            if s0 == 0:
                parts.append(live_seg(0))
            else:
                parts.append(jax.lax.cond(s0 < total_capped, live_seg, dead_seg, 0))
        tid = jnp.concatenate([p[0] for p in parts])
        gid = jnp.concatenate([p[1] for p in parts])
        feat = jnp.concatenate([p[2] for p in parts])
        if level == 2 or level == 3:
            return (jnp.sum(tid) + jnp.sum(gid)).astype(jnp.float32)[None, None] * 1e-20
        T_sent = num_tiles
        tid_all = jnp.concatenate([tid, jnp.arange(T_sent, dtype=jnp.int32)])
        gid_all = jnp.concatenate([gid, jnp.full((T_sent,), -1, jnp.int32)])
        if pack == "ride":
            ops = [tid_all, gid_all] + [
                jnp.concatenate([feat[:, k], jnp.zeros((T_sent,), jnp.float32)])
                for k in range(24)]
            out = bn.sort_grouped(tuple(ops), num_keys=1)
            tid_s, gid_s = out[0], out[1]
            payload_sum = sum(jnp.sum(o) for o in out[2:])
        else:
            tid_s, gid_s = jax.lax.sort((tid_all, gid_all), num_keys=1,
                                        is_stable=True)
            payload_sum = 0.0
        if level == 4:
            return (jnp.sum(gid_s).astype(jnp.float32) + payload_sum
                    )[None, None] * 1e-20
        Bs = B + T_sent
        flag = (gid_s < 0) & (tid_s < num_tiles)
        _, pos_s = jax.lax.sort(
            (jnp.where(flag, 0, 1).astype(jnp.int32),
             jnp.arange(Bs, dtype=jnp.int32)), num_keys=1, is_stable=True)
        s_pos = pos_s[:T_sent]
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_pos[:-1]])
        tile_count = s_pos - prev - 1
        if level == 5:
            return (jnp.sum(tile_count) + jnp.sum(gid_s)
                    ).astype(jnp.float32)[None, None] * 1e-20
        # level 6: the pack. ride: stack sorted payloads; legacy: (Bs,24)
        # random-id gather from the P-row table
        if pack == "ride":
            rows = jnp.stack(out[2:], axis=0)
            return jnp.sum(rows).astype(jnp.float32)[None, None] * 1e-20
        f = feat24[jnp.clip(gid_s, 0, P - 1)]
        f = jnp.where((gid_s >= 0)[:, None], f, 0.0)
        return jnp.sum(f).astype(jnp.float32)[None, None] * 1e-20

    names = ["L0 rects+argsort+cumsum", "L1 +owner(merge)", "L2 +expand gather",
             "L3 +decode/cull", "L4 +tile sort", "L5 +ranges", "L6 +pack"]
    for pack in ("legacy", "ride"):
        print(f"== part 3: composed dense pipeline, pack={pack} ==", flush=True)
        levels = range(7) if pack == "legacy" else [3, 4, 6]
        for lv in levels:
            fn = jax.jit(functools.partial(pipeline, level=lv, pack=pack))
            try:
                timed(f"[{pack}] {names[lv]}",
                      lambda bmp: fn(bmp) + jnp.zeros((1, 2)),
                      jnp.zeros((1, 2)), reps=5, warm=2)
            except Exception as e:  # keep later levels measurable
                print(f"[{pack}] {names[lv]} FAILED: {type(e).__name__} {e}",
                      flush=True)


def main():
    if os.environ.get("MB_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; the config update is the
        # only reliable CPU pin (CLAUDE.md) — needed for smoke tests while
        # another process holds the single TPU
        import jax
        jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "prims"):
        part2_primitives()
    if which in ("all", "dense"):
        part3_dense_pipeline()
    if which in ("all", "attr"):
        part1_attribution()


if __name__ == "__main__":
    main()

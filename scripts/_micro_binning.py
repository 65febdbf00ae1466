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
    if which in ("all", "attr"):
        part1_attribution()


if __name__ == "__main__":
    main()

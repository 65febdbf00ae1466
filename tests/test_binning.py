"""Static-shape tile binning vs a brute-force NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from radegs_tpu.ops.binning import bin_gaussians, tile_grid

RNG = np.random.default_rng(11)


def brute_force_tiles(xy, radius, depth, valid, W, H, tile=16):
    tiles_x, tiles_y = tile_grid(W, H, tile)
    out = {}
    for t in range(tiles_x * tiles_y):
        tx, ty = t % tiles_x, t // tiles_x
        members = []
        for i in range(len(xy)):
            if not valid[i] or radius[i] <= 0:
                continue
            rx_min = min(tiles_x, max(0, int(np.floor((xy[i, 0] - radius[i]) / tile))))
            ry_min = min(tiles_y, max(0, int(np.floor((xy[i, 1] - radius[i]) / tile))))
            rx_max = min(tiles_x, max(0, int(np.floor((xy[i, 0] + radius[i]) / tile)) + 1))
            ry_max = min(tiles_y, max(0, int(np.floor((xy[i, 1] + radius[i]) / tile)) + 1))
            if rx_min <= tx < rx_max and ry_min <= ty < ry_max:
                members.append(i)
        members.sort(key=lambda i: depth[i])
        out[t] = members
    return out


def test_binning_matches_bruteforce():
    P, W, H = 60, 96, 64
    xy = RNG.uniform(-10, 106, size=(P, 2)).astype(np.float32)
    radius = RNG.uniform(0, 30, size=(P,)).astype(np.float32).round()
    depth = RNG.uniform(0.5, 10, size=(P,)).astype(np.float32)
    valid = RNG.uniform(size=P) > 0.2

    binning = bin_gaussians(
        jnp.asarray(xy),
        jnp.asarray(radius),
        jnp.asarray(depth),
        jnp.asarray(valid),
        W,
        H,
        instance_budget=4096,
        max_per_tile=64,
    )
    want = brute_force_tiles(xy, radius, depth, valid, W, H)
    got = np.asarray(binning.tile_gauss)
    count = np.asarray(binning.tile_count)
    assert int(binning.n_overflow) == 0
    assert int(binning.tile_overflow) == 0
    for t, members in want.items():
        assert count[t] == len(members), f"tile {t}"
        np.testing.assert_array_equal(got[t, : len(members)], members)
        assert np.all(got[t, len(members):] == -1)
    # flat layout agrees too
    gid = np.asarray(binning.gauss_id)
    start = np.asarray(binning.tile_start)
    for t, members in want.items():
        np.testing.assert_array_equal(gid[start[t] : start[t] + len(members)], members)


def test_binning_instance_overflow_reported():
    P, W, H = 8, 64, 64
    xy = np.full((P, 2), 32.0, np.float32)
    radius = np.full((P,), 100.0, np.float32)  # every gaussian covers all 16 tiles
    depth = np.arange(P, dtype=np.float32)
    valid = np.ones(P, bool)
    binning = bin_gaussians(
        jnp.asarray(xy), jnp.asarray(radius), jnp.asarray(depth), jnp.asarray(valid),
        W, H, instance_budget=64, max_per_tile=8,
    )
    assert int(binning.n_instances) == P * 16
    assert int(binning.n_overflow) == P * 16 - 64
    # surviving entries are still depth sorted per tile
    got = np.asarray(binning.tile_gauss)
    for t in range(got.shape[0]):
        row = got[t][got[t] >= 0]
        assert np.all(np.diff(depth[row]) >= 0)


def test_precise_cull_is_exact():
    """Opacity-aware ellipse AABB + exact per-tile cull must not change the
    rendered image: every culled (gaussian, tile) pair has alpha < 1/255
    everywhere in the tile, which the blend skips anyway."""
    import jax

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.rasterize import rasterize

    rng = np.random.default_rng(5)
    P = 80
    W = H = 64
    cam = Camera.look_at([0, 0, -4.0], [0, 0, 0], [0, 1, 0], 0.8, 0.8, W, H)
    prep = preprocess_gaussians(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.9, jnp.float32),
        jnp.asarray(rng.uniform(0.02, 0.6, (P, 3)), jnp.float32),  # anisotropic
        jnp.asarray(np.tile([1.0, 0, 0, 0], (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0.01, 0.9, (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (P, 1, 3)), jnp.float32),
        sh_degree=0, camera=cam, kernel_size=0.1,
    )
    from radegs_tpu.ops.binning import bin_gaussians

    kw = dict(instance_budget=1 << 13, max_per_tile=128)
    loose = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, W, H, **kw)
    tight = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, W, H,
                          conic=prep.conic, opacity=prep.opacity, **kw)
    # culling must actually remove work on this anisotropic scene
    loose_work = int(jnp.sum(loose.tile_count))
    tight_work = int(jnp.sum(tight.tile_count))
    assert tight_work < loose_work, (tight_work, loose_work)

    bg = jnp.zeros(3)
    out_loose = rasterize(prep, cam, bg, binning=loose, backend="xla")
    out_tight = rasterize(prep, cam, bg, binning=tight, backend="xla")
    for k in ["render", "expected_depth", "median_depth", "normal", "mask"]:
        np.testing.assert_allclose(
            np.asarray(out_loose[k]), np.asarray(out_tight[k]), atol=1e-5, rtol=1e-5,
            err_msg=k,
        )


def test_binning_tile_cap():
    P, W, H = 32, 32, 32
    xy = np.full((P, 2), 8.0, np.float32)
    radius = np.full((P,), 4.0, np.float32)
    depth = RNG.permutation(P).astype(np.float32)
    valid = np.ones(P, bool)
    binning = bin_gaussians(
        jnp.asarray(xy), jnp.asarray(radius), jnp.asarray(depth), jnp.asarray(valid),
        W, H, instance_budget=256, max_per_tile=10,
    )
    got = np.asarray(binning.tile_gauss)
    count = np.asarray(binning.tile_count)
    t0 = 0  # tile containing (8,8)
    assert count[t0] == 10
    # the 10 kept must be the 10 nearest by depth, in order
    kept = got[t0][: count[t0]]
    want = np.argsort(depth, kind="stable")[:10]
    np.testing.assert_array_equal(kept, want)
    assert int(binning.tile_overflow) > 0


def test_segmented_expansion_matches_monolithic():
    """bin_gaussians' lax.cond slot segmentation (budget >> real instances)
    must produce exactly the monolithic expansion, culling included."""
    P, W, H = 80, 96, 64
    xy = RNG.uniform(-10, 106, size=(P, 2)).astype(np.float32)
    radius = RNG.uniform(0, 24, size=(P,)).astype(np.float32).round()
    depth = RNG.uniform(0.5, 10, size=(P,)).astype(np.float32)
    valid = RNG.uniform(size=P) > 0.2
    conic = np.tile(np.asarray([0.02, 0.0, 0.02], np.float32), (P, 1))
    conic += RNG.uniform(0, 0.01, size=(P, 3)).astype(np.float32)
    opacity = RNG.uniform(0.05, 1.0, size=(P,)).astype(np.float32)

    kw = dict(width=W, height=H, instance_budget=1 << 13, max_per_tile=64,
              conic=jnp.asarray(conic), opacity=jnp.asarray(opacity))
    args = (jnp.asarray(xy), jnp.asarray(radius), jnp.asarray(depth),
            jnp.asarray(valid))
    mono = bin_gaussians(*args, **kw, seg_rows=1 << 21,
                         need_sorted_orig=True)  # single segment
    seg = bin_gaussians(*args, **kw, seg_rows=512,
                        need_sorted_orig=True)   # 16 segments
    for f in ("gauss_id", "tile_id", "tile_start", "tile_count",
              "sorted_orig", "n_instances", "n_culled", "tile_overflow"):
        np.testing.assert_array_equal(np.asarray(getattr(mono, f)),
                                      np.asarray(getattr(seg, f)), err_msg=f)


def test_sort_without_orig_column_matches():
    """The default 2-column (tid, gid) sort must produce identical hot-path
    outputs to the 3-column diagnostics sort (sentinel detection now keys on
    gid < 0 & tid < num_tiles instead of the orig column)."""
    P, W, H = 120, 128, 96
    xy = RNG.uniform(-10, 140, size=(P, 2)).astype(np.float32)
    radius = RNG.uniform(0, 30, size=(P,)).astype(np.float32).round()
    depth = RNG.uniform(0.5, 10, size=(P,)).astype(np.float32)
    valid = RNG.uniform(size=P) > 0.2
    conic = np.tile(np.asarray([0.02, 0.0, 0.02], np.float32), (P, 1))
    conic += RNG.uniform(0, 0.01, size=(P, 3)).astype(np.float32)
    opacity = RNG.uniform(0.05, 1.0, size=(P,)).astype(np.float32)
    kw = dict(width=W, height=H, instance_budget=1 << 12, max_per_tile=48,
              conic=jnp.asarray(conic), opacity=jnp.asarray(opacity))
    args = (jnp.asarray(xy), jnp.asarray(radius), jnp.asarray(depth),
            jnp.asarray(valid))
    with_orig = bin_gaussians(*args, **kw, need_sorted_orig=True)
    without = bin_gaussians(*args, **kw)
    assert without.sorted_orig is None
    for f in ("gauss_id", "tile_id", "tile_start", "tile_count", "tile_gauss",
              "n_instances", "n_culled", "tile_overflow", "n_overflow"):
        np.testing.assert_array_equal(np.asarray(getattr(with_orig, f)),
                                      np.asarray(getattr(without, f)),
                                      err_msg=f)


def test_round_budget_buckets():
    """Compile-bucket policy: powers of two below one 2M segment, 2M-segment
    multiples above, capped at the f32-exact bound."""
    from radegs_tpu.ops.binning import (BUDGET_SEG, MAX_INSTANCE_BUDGET,
                                        round_budget)

    assert round_budget(1) == 1 << 14  # minimum
    assert round_budget(100_000) == 1 << 17
    assert round_budget(BUDGET_SEG) == BUDGET_SEG
    assert round_budget(BUDGET_SEG + 1) == 2 * BUDGET_SEG
    assert round_budget(10_500_000) == 6 * BUDGET_SEG  # not 16M
    assert round_budget(10 ** 9) == MAX_INSTANCE_BUDGET
    # every budget above one segment is segment-aligned (the segmented
    # stages' lax.cond boundaries rely on it)
    for need in (3_000_000, 5_555_555, 12_000_001):
        assert round_budget(need) % BUDGET_SEG == 0
        assert round_budget(need) >= need


def test_feat_pack_rides_sort_matches_legacy_gather():
    """Pack-rides-sort (features= argument) is bit-identical to the legacy
    post-sort random-id gather (pallas_blend.sorted_features), monolithic
    AND segmented, and leaves every other binning output unchanged."""
    from radegs_tpu.ops.pallas_blend import feature_rows, sorted_features

    rng = np.random.default_rng(3)
    P, W, H = 300, 256, 192
    xy = jnp.asarray(rng.uniform(0, 250, (P, 2)).astype(np.float32))
    radius = jnp.asarray(rng.uniform(1, 30, P).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 5, P).astype(np.float32))
    valid = jnp.asarray(rng.random(P) > 0.1)
    L = rng.normal(size=(P, 2, 2)).astype(np.float32)
    cc = np.einsum("pij,pkj->pik", L, L) + np.eye(2, dtype=np.float32)[None] * 0.1
    conic = jnp.asarray(np.stack([cc[:, 0, 0], cc[:, 0, 1], cc[:, 1, 1]], 1))
    opacity = jnp.asarray(rng.uniform(0.01, 1, P).astype(np.float32))
    inputs = (xy, conic, opacity,
              jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(P, 3, 2)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(P, 2)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32)),
              jnp.asarray(rng.normal(size=P).astype(np.float32)))
    feats = feature_rows(inputs)
    kw = dict(instance_budget=4096, max_per_tile=256, conic=conic,
              opacity=opacity, need_tile_gauss=False)
    b_old = bin_gaussians(xy, radius, depth, valid, W, H, **kw)
    b_new = bin_gaussians(xy, radius, depth, valid, W, H, features=feats, **kw)
    for name in ("gauss_id", "tile_id", "tile_start", "tile_count",
                 "n_instances", "n_overflow", "n_culled"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_old, name)),
            np.asarray(getattr(b_new, name)), err_msg=name)
    legacy = np.asarray(sorted_features(b_old, inputs))
    np.testing.assert_array_equal(legacy, np.asarray(b_new.feat_pack))
    b_seg = bin_gaussians(xy, radius, depth, valid, W, H, features=feats,
                          seg_rows=1024, **kw)
    np.testing.assert_array_equal(legacy, np.asarray(b_seg.feat_pack))


def test_sort_grouped_matches_monolithic():
    """Grouped payload sorts reproduce the monolithic variadic stable sort
    exactly (identical permutation via stability), for group sizes smaller,
    equal and larger than the payload count, and with multiple keys."""
    from radegs_tpu.ops.binning import sort_grouped

    rng = np.random.default_rng(5)
    n = 4097
    key = jnp.asarray(rng.integers(0, 50, n).astype(np.int32))
    key2 = jnp.asarray(rng.integers(0, 7, n).astype(np.int32))
    pays = tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                 for _ in range(9))
    want = jax.lax.sort((key,) + pays, num_keys=1, is_stable=True)
    for g in (2, 3, 9, 100):
        got = sort_grouped((key,) + pays, num_keys=1, group=g)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    want2 = jax.lax.sort((key, key2) + pays, num_keys=2, is_stable=True)
    got2 = sort_grouped((key, key2) + pays, num_keys=2, group=4)
    for a, b in zip(want2, got2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

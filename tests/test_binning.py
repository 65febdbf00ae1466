"""Static-shape tile binning vs a brute-force NumPy oracle."""

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
            rx_max = min(tiles_x, max(0, int(np.floor((xy[i, 0] + radius[i] + tile - 1) / tile))))
            ry_max = min(tiles_y, max(0, int(np.floor((xy[i, 1] + radius[i] + tile - 1) / tile))))
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

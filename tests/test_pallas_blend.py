"""Pallas blend kernels vs the XLA scan path (interpret mode on CPU).

The XLA scan (ops/rasterize.py) is itself validated against the exact
reference renderer and autodiff oracle (test_rasterize.py), so parity here
closes the chain for the TPU kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.core.camera import Camera
from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.ops.binning import bin_gaussians
from radegs_tpu.ops.pallas_blend import blend_forward_pallas
from radegs_tpu.ops.rasterize import RasterCfg, _blend_forward_scan, rasterize

FIELDS = ["xy", "conic", "opacity", "rgb", "view_point", "camera_plane",
          "ray_plane", "normal", "ts"]


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    P = 120
    cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 0.9, 0.9, 64, 48)
    prep = preprocess_gaussians(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.6, jnp.float32),
        jnp.asarray(np.exp(rng.normal(size=(P, 3)) * 0.4 - 1.8), jnp.float32),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (P, 1)),
        jnp.full((P, 1), 0.7),
        jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 1, 3)), jnp.float32),
        sh_degree=0,
        camera=cam,
        kernel_size=0.1,
    )
    return cam, prep


def test_forward_parity(scene):
    cam, prep = scene
    binning = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, 64, 48,
                            instance_budget=1 << 11, max_per_tile=128)
    inputs = (prep.xy, prep.conic, prep.opacity, prep.rgb, prep.view_point,
              prep.camera_plane, prep.ray_plane, prep.normal, prep.ts)
    cfg = RasterCfg(width=64, height=48)
    ref = _blend_forward_scan(cfg, binning.tile_gauss, inputs)
    pal = blend_forward_pallas(binning, *inputs, width=64, height=48, chunk=16,
                               interpret=True)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(pal[k])
        if k == "med_pos":
            assert (a == b).all()
        else:
            assert np.abs(a - b).max() < 1e-5, k


def test_gradient_parity(scene):
    cam, prep = scene
    bg = jnp.zeros(3)

    def loss_fn(fvals, backend):
        pr = prep.replace(**dict(zip(FIELDS, fvals)))
        out = rasterize(pr, cam, bg, max_per_tile=128, instance_budget=1 << 11,
                        backend=backend)
        return (jnp.sum(out["render"]) + 0.7 * jnp.sum(out["expected_depth"])
                + 0.3 * jnp.sum(out["median_depth"]) + 0.2 * jnp.sum(out["expected_coord"])
                + 0.11 * jnp.sum(out["median_coord"]) + 0.23 * jnp.sum(out["normal"])
                + 0.41 * jnp.sum(out["mask"]))

    fvals = tuple(getattr(prep, f) for f in FIELDS)
    gx = jax.grad(lambda v: loss_fn(v, "xla"))(fvals)
    gp = jax.grad(lambda v: loss_fn(v, "pallas_interpret"))(fvals)
    for f, a, b in zip(FIELDS, gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert rel < 1e-5, (f, rel)


def test_gof_abs_grad_side_channel_parity(scene):
    cam, prep = scene
    bg = jnp.zeros(3)

    def absg(backend):
        def f(xy_abs):
            out = rasterize(prep, cam, bg, max_per_tile=128, instance_budget=1 << 11,
                            xy_abs=xy_abs, backend=backend)
            return jnp.sum(out["render"])

        return jax.grad(f)(jnp.zeros_like(prep.xy))

    a, b = np.asarray(absg("xla")), np.asarray(absg("pallas_interpret"))
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 1e-5


def test_backward_orient_nm_matches_mn(scene):
    """The transposed in-kernel reduction orientation ("nm": (16, px)
    contracted with (14*SUBK, px) for full-lane MXU tiles) must reproduce
    the default "mn" per-instance gradients bit-for-bit in interpret mode
    (same math, same f32 accumulation order per dot element)."""
    from radegs_tpu.ops.pallas_blend import (blend_backward_pallas,
                                             blend_forward_pallas)

    cam, prep = scene
    binning = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid,
                            64, 48, instance_budget=1 << 11, max_per_tile=128)
    inputs = (prep.xy, prep.conic, prep.opacity, prep.rgb, prep.view_point,
              prep.camera_plane, prep.ray_plane, prep.normal, prep.ts)
    fwd = blend_forward_pallas(binning, *inputs, width=64, height=48,
                               chunk=16, interpret=True)
    rng = np.random.default_rng(5)
    cot = {k: (None if k == "med_pos"
               else jnp.asarray(rng.normal(size=v.shape), jnp.float32))
           for k, v in fwd.items()}
    g_mn = blend_backward_pallas(binning, inputs, fwd, cot, width=64,
                                 height=48, chunk=16, interpret=True,
                                 orient="mn")
    g_nm = blend_backward_pallas(binning, inputs, fwd, cot, width=64,
                                 height=48, chunk=16, interpret=True,
                                 orient="nm")
    for k in g_mn:
        a, b = np.asarray(g_mn[k]), np.asarray(g_nm[k])
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert rel < 1e-6, (k, rel)


def test_segmented_grad_reduction_matches_monolithic():
    """_reduce_grad_rows: the lax.cond row segmentation (budget >> real
    rows) must be exactly the plain scatter-add."""
    from radegs_tpu.ops.pallas_blend import N_GRAD, N_GRAD_PAD, _reduce_grad_rows

    rng = np.random.default_rng(11)
    P, B_out, total = 37, 4096, 900  # real rows stop inside segment 1
    g = rng.normal(size=(N_GRAD_PAD, B_out)).astype(np.float32)
    gid = rng.integers(-1, P, size=B_out)
    g[N_GRAD] = gid.astype(np.float32)
    gi = jnp.asarray(g)
    mono = _reduce_grad_rows(gi, jnp.int32(total), P, seg_rows=B_out)
    seg = _reduce_grad_rows(gi, jnp.int32(total), P, seg_rows=512)
    np.testing.assert_allclose(np.asarray(mono), np.asarray(seg), rtol=0, atol=0)
    # oracle: numpy accumulation over the masked prefix
    want = np.zeros((P, N_GRAD), np.float32)
    for i in range(total):
        if 0 <= gid[i] < P:
            want[gid[i]] += g[:N_GRAD, i]
    np.testing.assert_allclose(np.asarray(mono).T, want, atol=1e-4)


def test_segmented_feature_pack_matches_monolithic(scene):
    """sorted_features(seg_rows=...) must match the monolithic pack on the
    live prefix (real rows + sentinels) and leave only dead slots different
    (zeros vs gathered-but-unread culled/padding rows)."""
    from radegs_tpu.ops.pallas_blend import sorted_features

    cam, prep = scene
    binning = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid,
                            64, 48, instance_budget=1 << 11, max_per_tile=128,
                            conic=prep.conic, opacity=prep.opacity)
    inputs = (prep.xy, prep.conic, prep.opacity, prep.rgb, prep.view_point,
              prep.camera_plane, prep.ray_plane, prep.normal, prep.ts)
    mono = np.asarray(sorted_features(binning, inputs))
    seg = np.asarray(sorted_features(binning, inputs, seg_rows=512))
    T = binning.tile_start.shape[0]
    B = binning.gauss_id.shape[0]
    n_live = min(int(binning.n_instances), B - T) + T
    np.testing.assert_array_equal(seg[:, :n_live], mono[:, :n_live])
    # every slot any tile's kernel window can read agrees
    ends = np.asarray(binning.tile_start + binning.tile_count)
    assert int(ends.max()) <= n_live


def test_feat_ride_env_matches_legacy(scene, monkeypatch):
    """RADEGS_FEAT_RIDE=1 (pack rides the binning sort) produces the exact
    same rasterize outputs and gradients as the legacy post-sort gather."""
    import radegs_tpu.ops.rasterize as rz

    cam, prep = scene
    bg = jnp.zeros(3)

    def run():
        out = rz.rasterize(prep, cam, bg, max_per_tile=128,
                           instance_budget=1 << 11,
                           backend="pallas_interpret")
        return out["render"], out["binning"].feat_pack is not None

    monkeypatch.setenv("RADEGS_FEAT_RIDE", "0")
    img0, ride0 = run()
    monkeypatch.setenv("RADEGS_FEAT_RIDE", "1")
    img1, ride1 = run()
    assert not ride0 and ride1
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))

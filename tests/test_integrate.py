"""Integrate (point-opacity) op: ray-space density, per-point transmittance
ordering, SDF sign, and image-channel consistency with render()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.core.camera import Camera
from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.renderer import integrate, render


@pytest.fixture(scope="module")
def scene():
    """An opaque wall of Gaussians at z=0 facing the camera at z=-4."""
    rng = np.random.default_rng(3)
    n = 11
    g = np.stack(np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n)), -1)
    pts = np.concatenate([g.reshape(-1, 2), np.zeros((n * n, 1))], 1).astype(np.float32)
    cols = rng.uniform(0.2, 0.9, size=(n * n, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=gm.round_capacity(n * n, 128))
    state = state.replace(
        params=state.params.replace(
            opacity=jnp.where(state.active[:, None], gm.inverse_sigmoid(jnp.float32(0.95)),
                              state.params.opacity),
            scaling=jnp.where(state.active[:, None], jnp.log(jnp.float32(0.16)),
                              state.params.scaling),
        )
    )
    cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 0.8, 0.8, 64, 64)
    return state, cam


def test_invraycov_matches_true_density(scene):
    state, cam = scene
    scales, opacity = state.get_fused_scaling_opacity()
    prep = preprocess_gaussians(
        state.params.xyz, scales, state.get_rotation(), opacity,
        state.get_features(), sh_degree=3, camera=cam, compute_invraycov=True,
    )
    # for an axis-aligned gaussian at the optical axis, the ray-space density
    # along z equals the world density: sigma_t = scale_z at the center ray
    idx = 60  # center of the 11x11 grid
    irc = np.asarray(prep.invraycov[idx])
    s = float(np.asarray(scales[idx, 2]))
    # the (t,t) entry of the inverse ray covariance ~ 1/s^2 (view dir ~ +z)
    assert abs(irc[2, 2] * s * s - 1.0) < 0.05, irc[2, 2] * s * s


def test_alpha_integrated_ordering_and_sdf(scene):
    state, cam = scene
    bg = jnp.zeros(3)
    # probe points along the central ray: in front, at, and behind the wall
    probes = jnp.asarray(
        [[0.0, 0.0, -2.0], [0.0, 0.0, -0.3], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    out = integrate(probes, state, cam, bg, max_per_tile=256, instance_budget=1 << 13)
    a = np.asarray(out["alpha_integrated"])
    assert bool(np.all(np.asarray(out["point_valid"])))
    # transmittance-weighted opacity grows monotonically with depth
    assert a[0] < 0.05, a
    assert a[0] <= a[1] + 1e-5 and a[1] <= a[2] + 1e-5 and a[2] <= a[3] + 1e-5, a
    assert a[3] > 0.9, a

    sdf = np.asarray(out["point_sdf"])
    # median surface sits near z=0: point in front -> positive, behind -> negative
    assert sdf[0] > 0.5, sdf
    assert sdf[3] < -0.5, sdf

    # render-channel consistency. NOTE integrateCUDA samples at pixel centers
    # (+0.5, forward.cu:982) while renderCUDA samples integer coords — a
    # faithful half-pixel offset — so only mean agreement is expected.
    rout = render(state, cam, bg, max_per_tile=256, instance_budget=1 << 13)
    img9 = np.asarray(out["render"])
    assert np.abs(img9[0:3] - np.asarray(rout["render"])).mean() < 2e-2
    assert np.abs(img9[7] - np.asarray(rout["mask"][0])).mean() < 3e-2
    # median depth channel is the raw ray distance (render's is /= ln)
    H, W = 64, 64
    fx = float(np.asarray(cam.focal_x))
    cx = (np.arange(W) + 0.5 - W / 2) / fx
    cy = (np.arange(H) + 0.5 - H / 2) / float(np.asarray(cam.focal_y))
    ln = np.sqrt(cx[None, :] ** 2 + cy[:, None] ** 2 + 1.0)
    med_render = np.asarray(rout["median_depth"][0]) * ln
    mid_pix = np.abs(img9[4] - med_render)
    sel = np.asarray(rout["mask"][0]) > 0.9
    assert np.quantile(mid_pix[sel], 0.9) < 5e-2

    # projected-point count channel
    assert img9[8].sum() == probes.shape[0]

    # color_integrated: the point's pixel's final blended color C + T*bg
    # (forward.cu:1354) — all probes sit on the central ray, so every row
    # must equal the image color at that pixel
    ci = np.asarray(out["color_integrated"])
    assert ci.shape == (probes.shape[0], 3)
    px = np.asarray(out["point_coordinate"])
    for k in range(probes.shape[0]):
        i, j = int(px[k, 0]), int(px[k, 1])
        np.testing.assert_allclose(ci[k], img9[0:3, j, i], atol=1e-6)


def test_pallas_integrate_full_parity(scene):
    """Full integrate dict: pallas point phase vs the XLA walk."""
    import jax

    from radegs_tpu.core.projection import preprocess_gaussians

    state, cam = scene
    bg = jnp.zeros(3)
    probes = jnp.asarray(
        np.concatenate([
            np.random.default_rng(5).normal(size=(200, 3)) * 0.8,
            [[0, 0, -1.0], [0, 0, 0.5]],
        ]), jnp.float32,
    )
    from radegs_tpu.renderer import integrate as rintegrate

    scales, opacity = state.get_fused_scaling_opacity()
    opacity = jnp.where(state.active[:, None], opacity, 0.0)
    prep = preprocess_gaussians(
        state.params.xyz, scales, state.get_rotation(), opacity,
        state.get_features(), sh_degree=3, camera=cam, compute_invraycov=True,
    )
    prep = prep.replace(valid=prep.valid & state.active)
    from radegs_tpu.ops.integrate import integrate as op_integrate

    ox = op_integrate(probes, prep, cam, bg, max_per_tile=256,
                      instance_budget=1 << 13, backend="xla")
    op = op_integrate(probes, prep, cam, bg, max_per_tile=256,
                      instance_budget=1 << 13, backend="pallas_interpret")
    ax = np.where(np.asarray(ox["point_valid"]), np.asarray(ox["alpha_integrated"]), 1.0)
    ap = np.asarray(op["alpha_integrated"])
    assert np.abs(ax - ap).max() < 1e-5
    np.testing.assert_allclose(np.asarray(ox["point_sdf"]), np.asarray(op["point_sdf"]),
                               atol=1e-5)
    # phase A (the 9-channel integrate image) also runs through the pallas
    # kernel under pallas_interpret — compare the full image + color samples
    np.testing.assert_allclose(np.asarray(ox["render"]), np.asarray(op["render"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ox["color_integrated"]),
                               np.asarray(op["color_integrated"]), atol=1e-5)

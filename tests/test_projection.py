"""Validation of the EWA projection + RaDe-GS plane derivation.

The strongest checks here are *independent oracles*: the ray/camera planes
and the analytic normal are compared against finite differences of the
closed-form ray-space maximum-density point

    s*(u,v) = (r^T Sigma_cam^-1 mu) / (r^T Sigma_cam^-1 r) * |r|,
    r = (u, v, 1)

which is the quantity RaDe-GS's forward.cu:135-262 linearizes. If our
row-major decoding of the reference's column-major glm algebra were wrong,
these tests would fail.
"""

import jax
import jax.numpy as jnp
import numpy as np

from radegs_tpu.core.camera import Camera
from radegs_tpu.core.gaussians import build_covariance, quat_to_rotmat
from radegs_tpu.core.projection import ndc2pix, preprocess_gaussians

RNG = np.random.default_rng(7)


def make_scene(P=16, seed=3):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.8
    q = rng.normal(size=(P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    scales = np.exp(rng.normal(size=(P, 3)).astype(np.float32) * 0.3) * 0.1
    opac = rng.uniform(0.3, 0.95, size=(P, 1)).astype(np.float32)
    sh = rng.normal(size=(P, 16, 3)).astype(np.float32) * 0.2
    cam = Camera.look_at([0.2, -0.3, -4.0], [0, 0, 0], [0, 1, 0], 0.9, 0.9, 128, 128)
    return means, scales, q, opac, sh, cam


def run_prep(means, scales, q, opac, sh, cam, kernel_size=0.0):
    return preprocess_gaussians(
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(q),
        jnp.asarray(opac),
        jnp.asarray(sh),
        sh_degree=3,
        camera=cam,
        kernel_size=kernel_size,
    )


def camera_space_quantities(means, scales, q, cam):
    """NumPy: view point, Sigma_cam, normalized image coords."""
    wv = np.asarray(cam.world_view)
    Rw2c, T = wv[:3, :3], wv[:3, 3]
    cov_w = np.asarray(build_covariance(jnp.asarray(scales), jnp.asarray(q)))
    p_view = means @ Rw2c.T + T
    cov_cam = Rw2c @ cov_w @ Rw2c.T
    return p_view, cov_cam


def s_star(u, v, mu, cov_cam_inv):
    """Closed-form distance of maximum density along the ray (u, v, 1)."""
    r = np.array([u, v, 1.0])
    num = r @ cov_cam_inv @ mu
    den = r @ cov_cam_inv @ r
    return num / den * np.linalg.norm(r)


def x_star(u, v, mu, cov_cam_inv):
    """Camera-space point of maximum density along the ray."""
    r = np.array([u, v, 1.0])
    num = r @ cov_cam_inv @ mu
    den = r @ cov_cam_inv @ r
    return (num / den) * r


def unclamped(p_view, cam):
    """Mask of Gaussians unaffected by the view-cone clamp (forward.cu:87-94):
    for clamped points the linearization point shifts and FD oracles based on
    the true center no longer apply."""
    lim_x = 1.3 * np.tan(float(cam.fovx) / 2)
    lim_y = 1.3 * np.tan(float(cam.fovy) / 2)
    u = p_view[:, 0] / p_view[:, 2]
    v = p_view[:, 1] / p_view[:, 2]
    return (np.abs(u) < lim_x) & (np.abs(v) < lim_y)


def test_cov2d_matches_numpy_ewa():
    means, scales, q, opac, sh, cam = make_scene()
    prep = run_prep(means, scales, q, opac, sh, cam, kernel_size=0.1)
    p_view, cov_cam = camera_space_quantities(means, scales, q, cam)
    fx = float(cam.focal_x)
    fy = float(cam.focal_y)
    conic = np.asarray(prep.conic)
    limx = 1.3 * np.tan(0.45)
    limy = 1.3 * np.tan(0.45)
    for i in range(len(means)):
        if not bool(prep.valid[i]):
            continue
        x, y, z = p_view[i]
        # same view-cone clamp as forward.cu:87-94
        x = np.clip(x / z, -limx, limx) * z
        y = np.clip(y / z, -limy, limy) * z
        J = np.array([[fx / z, 0, -fx * x / z**2], [0, fy / z, -fy * y / z**2]])
        c2 = J @ cov_cam[i] @ J.T
        c2f = c2 + 0.1 * np.eye(2)
        inv = np.linalg.inv(c2f)
        np.testing.assert_allclose(
            conic[i], [inv[0, 0], inv[0, 1], inv[1, 1]], rtol=2e-3, atol=1e-4
        )


def test_mip2d_opacity_coef():
    means, scales, q, opac, sh, cam = make_scene()
    prep0 = run_prep(means, scales, q, opac, sh, cam, kernel_size=0.0)
    prep1 = run_prep(means, scales, q, opac, sh, cam, kernel_size=0.3)
    # with the filter, effective opacity shrinks by sqrt(det0/det1) < 1
    v = np.asarray(prep0.valid)
    assert np.all(np.asarray(prep1.opacity)[v] <= np.asarray(prep0.opacity)[v] + 1e-6)
    # kernel_size=0 keeps opacity ~unchanged (coef = sqrt(det/(det+1e-6)+1e-6))
    np.testing.assert_allclose(
        np.asarray(prep0.opacity)[v], opac[:, 0][v], rtol=5e-2
    )


def test_center_projection():
    means, scales, q, opac, sh, cam = make_scene()
    prep = run_prep(means, scales, q, opac, sh, cam)
    p_view, _ = camera_space_quantities(means, scales, q, cam)
    fx, fy = float(cam.focal_x), float(cam.focal_y)
    W, H = cam.width, cam.height
    # ndc2pix of the perspective projection == fx*u + (W-1)/2
    u = p_view[:, 0] / p_view[:, 2]
    v = p_view[:, 1] / p_view[:, 2]
    want_x = fx * u + (W - 1) / 2.0
    want_y = fy * v + (H - 1) / 2.0
    np.testing.assert_allclose(np.asarray(prep.xy)[:, 0], want_x, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(prep.xy)[:, 1], want_y, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(prep.depth), p_view[:, 2], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(prep.ts), np.linalg.norm(p_view, axis=-1), rtol=1e-5
    )


def test_ray_plane_matches_finite_difference():
    means, scales, q, opac, sh, cam = make_scene()
    prep = run_prep(means, scales, q, opac, sh, cam)
    p_view, cov_cam = camera_space_quantities(means, scales, q, cam)
    fx, fy = float(cam.focal_x), float(cam.focal_y)
    rp = np.asarray(prep.ray_plane)
    ts = np.asarray(prep.ts)
    eps = 1e-4
    ok = unclamped(p_view, cam)
    for i in range(len(means)):
        if not (bool(prep.valid[i]) and ok[i]):
            continue
        mu = p_view[i]
        inv = np.linalg.inv(cov_cam[i])
        u0, v0 = mu[0] / mu[2], mu[1] / mu[2]
        s0 = s_star(u0, v0, mu, inv)
        np.testing.assert_allclose(s0, ts[i], rtol=1e-4)
        # d pixel_x = fx * du  =>  ds/dpix_x = (ds/du)/fx
        ds_du = (s_star(u0 + eps, v0, mu, inv) - s_star(u0 - eps, v0, mu, inv)) / (2 * eps)
        ds_dv = (s_star(u0, v0 + eps, mu, inv) - s_star(u0, v0 - eps, mu, inv)) / (2 * eps)
        # render kernel: t = ts + ray_plane . (xy - pix), d = center - pixel,
        # so ray_plane = -ds/dpix
        np.testing.assert_allclose(rp[i, 0], -ds_du / fx, rtol=5e-3, atol=1e-6)
        np.testing.assert_allclose(rp[i, 1], -ds_dv / fy, rtol=5e-3, atol=1e-6)


def test_camera_plane_matches_finite_difference():
    means, scales, q, opac, sh, cam = make_scene()
    prep = run_prep(means, scales, q, opac, sh, cam)
    p_view, cov_cam = camera_space_quantities(means, scales, q, cam)
    fx, fy = float(cam.focal_x), float(cam.focal_y)
    cp = np.asarray(prep.camera_plane)
    eps = 1e-4
    ok = unclamped(p_view, cam)
    for i in range(len(means)):
        if not (bool(prep.valid[i]) and ok[i]):
            continue
        mu = p_view[i]
        inv = np.linalg.inv(cov_cam[i])
        u0, v0 = mu[0] / mu[2], mu[1] / mu[2]
        dx_du = (x_star(u0 + eps, v0, mu, inv) - x_star(u0 - eps, v0, mu, inv)) / (2 * eps)
        dx_dv = (x_star(u0, v0 + eps, mu, inv) - x_star(u0, v0 - eps, mu, inv)) / (2 * eps)
        np.testing.assert_allclose(cp[i, :, 0], -dx_du / fx, rtol=5e-3, atol=1e-5)
        np.testing.assert_allclose(cp[i, :, 1], -dx_dv / fy, rtol=5e-3, atol=1e-5)


def test_normal_is_perpendicular_to_depth_surface():
    means, scales, q, opac, sh, cam = make_scene()
    prep = run_prep(means, scales, q, opac, sh, cam)
    p_view, cov_cam = camera_space_quantities(means, scales, q, cam)
    normal = np.asarray(prep.normal)
    eps = 1e-4
    ok = unclamped(p_view, cam)
    for i in range(len(means)):
        if not (bool(prep.valid[i]) and ok[i]):
            continue
        mu = p_view[i]
        inv = np.linalg.inv(cov_cam[i])
        u0, v0 = mu[0] / mu[2], mu[1] / mu[2]
        tan_u = (x_star(u0 + eps, v0, mu, inv) - x_star(u0 - eps, v0, mu, inv)) / (2 * eps)
        tan_v = (x_star(u0, v0 + eps, mu, inv) - x_star(u0, v0 - eps, mu, inv)) / (2 * eps)
        n = normal[i]
        assert abs(np.linalg.norm(n) - 1.0) < 1e-4
        assert abs(n @ tan_u) < 2e-3 * np.linalg.norm(tan_u)
        assert abs(n @ tan_v) < 2e-3 * np.linalg.norm(tan_v)
        # points toward the camera (negative z half-space in view coords)
        assert n @ (mu / np.linalg.norm(mu)) < 0


def test_frustum_cull():
    means = np.array([[0, 0, 0], [0, 0, -100.0]], np.float32)  # 2nd far behind
    scales = np.full((2, 3), 0.1, np.float32)
    q = np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
    opac = np.full((2, 1), 0.8, np.float32)
    sh = np.zeros((2, 16, 3), np.float32)
    cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 0.9, 0.9, 64, 64)
    prep = run_prep(means, scales, q, opac, sh, cam)
    assert bool(prep.valid[0])
    assert not bool(prep.valid[1])
    assert float(prep.radius[1]) == 0.0


def test_preprocess_grads_finite_everywhere():
    """Culled/degenerate lanes must not poison gradients with NaNs."""
    means, scales, q, opac, sh, cam = make_scene(P=8)
    means[0] = [0, 0, -100.0]  # behind camera
    scales[1] = [1e-9, 1e-9, 1e-9]  # degenerate

    def loss(m, s, qq, o):
        prep = preprocess_gaussians(
            m, s, qq, o, jnp.asarray(sh), 3, cam, kernel_size=0.1
        )
        val = jnp.where(prep.valid, 1.0, 0.0)
        return (
            jnp.sum(prep.xy * val[:, None])
            + jnp.sum(prep.conic * val[:, None])
            + jnp.sum(prep.normal * val[:, None])
            + jnp.sum(prep.ray_plane * val[:, None])
            + jnp.sum(prep.camera_plane * val[:, None, None])
            + jnp.sum(prep.opacity * val)
            + jnp.sum(prep.ts * val)
        )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q), jnp.asarray(opac)
    )
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g))), g

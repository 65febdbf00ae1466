"""Unit tests for radegs_tpu.core against NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.core.camera import Camera, fov2focal
from radegs_tpu.core.eigen import (
    sym3x3_eigendecomposition,
    sym3x3_eigenvalues,
    sym3x3_inverse,
)
from radegs_tpu.core.gaussians import (
    build_covariance,
    compute_3d_filter,
    fuse_3d_filter,
    opacity_coef_3d_filter,
    quat_to_rotmat,
    scaling_with_3d_filter,
)
from radegs_tpu.core.sh import eval_sh_color, num_sh_coeffs, rgb2sh, sh2rgb

RNG = np.random.default_rng(0)


def rand_quat(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------- eigen


def test_eigenvalues_match_numpy():
    A = RNG.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3, dtype=np.float32)
    ours = np.asarray(sym3x3_eigenvalues(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_eigendecomposition_reconstructs():
    A = RNG.normal(size=(32, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 0.05 * np.eye(3, dtype=np.float32)
    lam, V, ok = sym3x3_eigendecomposition(jnp.asarray(A))
    lam, V = np.asarray(lam), np.asarray(V)
    recon = np.einsum("pik,pk,pjk->pij", V, lam, V)
    np.testing.assert_allclose(recon, A, rtol=1e-2, atol=1e-3)
    # orthonormality
    eye = np.einsum("pki,pkj->pij", V, V)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)


def test_sym3x3_inverse():
    A = RNG.normal(size=(16, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 0.2 * np.eye(3, dtype=np.float32)
    inv = np.asarray(sym3x3_inverse(jnp.asarray(A)))
    np.testing.assert_allclose(inv, np.linalg.inv(A), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- quaternions / covariance


def test_quat_to_rotmat_is_rotation():
    q = rand_quat(50)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    eye = R @ R.transpose(0, 2, 1)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_identity():
    R = np.asarray(quat_to_rotmat(jnp.array([1.0, 0, 0, 0])))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_covariance_eigvals_are_squared_scales():
    q = rand_quat(20)
    s = np.exp(RNG.normal(size=(20, 3))).astype(np.float32)
    cov = np.asarray(build_covariance(jnp.asarray(s), jnp.asarray(q, jnp.float32)))
    lam = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    np.testing.assert_allclose(lam, np.sort(s**2, axis=-1), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- SH


def sh_oracle(deg, sh, dirs):
    """NumPy oracle re-implementing utils/sh_utils.py:57-110."""
    C0, C1 = 0.28209479177387814, 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005, -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658, 0.3731763325901154, -0.4570457994644658, 1.445305721320277, -0.5900435899266435]
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :]
                )
    return result


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_eval_sh_color_matches_oracle(deg):
    P, M = 40, num_sh_coeffs(3)
    sh = RNG.normal(size=(P, M, 3)).astype(np.float32) * 0.3
    means = RNG.normal(size=(P, 3)).astype(np.float32) * 2
    campos = np.array([0.5, -0.2, -3.0], np.float32)
    rgb, clamped = eval_sh_color(deg, jnp.asarray(sh), jnp.asarray(means), jnp.asarray(campos))
    dirs = means - campos
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    want = np.maximum(sh_oracle(deg, sh, dirs) + 0.5, 0.0)
    np.testing.assert_allclose(np.asarray(rgb), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(clamped), sh_oracle(deg, sh, dirs) + 0.5 < 0)


def test_rgb_sh_roundtrip():
    rgb = RNG.uniform(size=(10, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sh2rgb(rgb2sh(jnp.asarray(rgb)))), rgb, atol=1e-6)


# ---------------------------------------------------------------- camera


def world_view_oracle(R, T):
    """utils/graphics_utils.py:40-65 without translate/scale."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = T
    Rt[3, 3] = 1.0
    return Rt.astype(np.float32)


def projection_oracle(znear, zfar, fovx, fovy):
    """utils/graphics_utils.py:67-87."""
    tanY, tanX = np.tan(fovy / 2), np.tan(fovx / 2)
    top, right = tanY * znear, tanX * znear
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 2 * znear / (2 * right)
    P[1, 1] = 2 * znear / (2 * top)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def test_camera_matrices_match_reference_convention():
    q = rand_quat(1)[0]
    Rn = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    T = np.array([0.3, -1.0, 4.0], np.float32)
    cam = Camera.create(Rn, T, fovx=0.9, fovy=0.7, width=640, height=480)
    np.testing.assert_allclose(np.asarray(cam.world_view), world_view_oracle(Rn, T), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cam.projection), projection_oracle(0.01, 100.0, 0.9, 0.7), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cam.full_proj),
        projection_oracle(0.01, 100.0, 0.9, 0.7) @ world_view_oracle(Rn, T),
        atol=1e-5,
    )
    # camera center: solve world_view @ [c,1] = [0,0,0,1]
    c = np.asarray(cam.camera_center)
    back = world_view_oracle(Rn, T) @ np.append(c, 1.0)
    np.testing.assert_allclose(back[:3], 0.0, atol=1e-5)
    np.testing.assert_allclose(float(cam.focal_x), fov2focal(0.9, 640), rtol=1e-6)


def test_look_at_points_forward():
    cam = Camera.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0], 1.0, 1.0, 64, 64)
    wv = np.asarray(cam.world_view)
    p_view = wv[:3, :3] @ np.zeros(3) + wv[:3, 3]
    np.testing.assert_allclose(p_view, [0, 0, 5], atol=1e-5)


# ---------------------------------------------------------------- 3D filter


def test_3d_filter_fusion():
    s = np.exp(RNG.normal(size=(30, 3))).astype(np.float32) * 0.1
    f = np.abs(RNG.normal(size=(30, 1))).astype(np.float32) * 0.05
    o = RNG.uniform(size=(30, 1)).astype(np.float32)
    want_s = np.sqrt(s**2 + f**2)
    want_coef = np.sqrt(np.prod(s**2, -1) / np.prod(s**2 + f**2, -1))
    np.testing.assert_allclose(np.asarray(scaling_with_3d_filter(s, f)), want_s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(opacity_coef_3d_filter(s, f)), want_coef, rtol=1e-5)
    fs, fo = fuse_3d_filter(jnp.asarray(s), jnp.asarray(o), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(fs), want_s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fo), o * want_coef[:, None], rtol=1e-5)


def test_compute_3d_filter_visible_point():
    cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 1.0, 1.0, 100, 100)
    xyz = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -10.0]])  # second is behind camera
    f = np.asarray(compute_3d_filter(xyz, [cam]))
    focal = 100 / (2 * np.tan(0.5))
    np.testing.assert_allclose(f[0, 0], 4.0 / focal * np.sqrt(0.2), rtol=1e-5)
    # invisible point gets the max visible distance
    np.testing.assert_allclose(f[1, 0], f[0, 0], rtol=1e-5)

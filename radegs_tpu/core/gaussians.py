"""Gaussian primitive math: quaternions, covariances, Mip-Splatting filters.

Reference semantics:
- quaternion -> rotation: utils/general_utils.py:80-101 (w,x,y,z layout).
- covariance build: cuda_rasterizer/forward.cu:270-304 (Sigma = R S^2 R^T).
- 3D filter fusion: scene/gaussian_model.py:117-166.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q):
    """Unit-normalize quaternion(s) (w,x,y,z) and convert to rotation matrices.

    q: (..., 4) -> (..., 3, 3). Matches utils/general_utils.py:80-101.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def quat_to_rotmat_raw(q):
    """Quaternion -> rotation WITHOUT normalization.

    The rasterizer preprocess intentionally skips normalization
    (forward.cu:279 — commented-out division), relying on the model applying
    torch.nn.functional.normalize first. Keep both entry points so parity
    tests can match either call site.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_covariance(scales, quats, scale_modifier=1.0):
    """World-space 3x3 covariance Sigma = R diag(s^2) R^T (forward.cu:270-304).

    scales: (..., 3) post-activation (positive) scales.
    quats:  (..., 4) rotations (will NOT be re-normalized; pass normalized).
    Returns (..., 3, 3).
    """
    R = quat_to_rotmat_raw(quats)
    s2 = jnp.square(scales * scale_modifier)
    return jnp.einsum("...ij,...j,...kj->...ik", R, s2, R)


def cov3d_to_sym6(cov):
    """Pack (...,3,3) symmetric covariance into the reference's 6-float layout
    [xx, xy, xz, yy, yz, zz] (forward.cu:296-303)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def sym6_to_cov3d(sym6):
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(sym6, -1, 0)
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_to_rotmat_comps(q):
    """Quaternion (w,x,y,z), NOT normalized -> 9 rotation components, each
    (...,): (r00,r01,r02, r10,r11,r12, r20,r21,r22).

    Component form keeps every per-Gaussian intermediate a flat (P,) vector:
    on TPU a (P,3,3) tensor is lane-padded 3->128 (a 42x HBM blowup), so the
    stacked-matrix form costs ~100ms/step in materialized fusions at P=131k.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    )


def covariance_sym6_comps(R9, s2):
    """Sigma = R diag(s2) R^T as 6 components (xx,xy,xz,yy,yz,zz); R9 the
    9-tuple from quat_to_rotmat_comps, s2 = (s0^2, s1^2, s2^2) tuple."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R9
    s0, s1, s2_ = s2

    def rr(a, b, c, d, e, f):
        return a * d * s0 + b * e * s1 + c * f * s2_

    return (
        rr(r00, r01, r02, r00, r01, r02),
        rr(r00, r01, r02, r10, r11, r12),
        rr(r00, r01, r02, r20, r21, r22),
        rr(r10, r11, r12, r10, r11, r12),
        rr(r10, r11, r12, r20, r21, r22),
        rr(r20, r21, r22, r20, r21, r22),
    )


def sym6_quadform(u, v, c6):
    """u^T C v with C the sym6 (xx,xy,xz,yy,yz,zz); u, v 3-tuples."""
    xx, xy, xz, yy, yz, zz = c6
    return (
        u[0] * v[0] * xx + u[1] * v[1] * yy + u[2] * v[2] * zz
        + (u[0] * v[1] + u[1] * v[0]) * xy
        + (u[0] * v[2] + u[2] * v[0]) * xz
        + (u[1] * v[2] + u[2] * v[1]) * yz
    )


def sym6_matvec(c6, v):
    """C v with C the sym6; v a 3-tuple -> 3-tuple."""
    xx, xy, xz, yy, yz, zz = c6
    return (
        xx * v[0] + xy * v[1] + xz * v[2],
        xy * v[0] + yy * v[1] + yz * v[2],
        xz * v[0] + yz * v[1] + zz * v[2],
    )


def sym6_rotate(Rg, c6):
    """R C R^T for a GLOBAL 3x3 R (array) and per-P sym6 C -> sym6."""
    rows = [(Rg[i, 0], Rg[i, 1], Rg[i, 2]) for i in range(3)]
    return (
        sym6_quadform(rows[0], rows[0], c6),
        sym6_quadform(rows[0], rows[1], c6),
        sym6_quadform(rows[0], rows[2], c6),
        sym6_quadform(rows[1], rows[1], c6),
        sym6_quadform(rows[1], rows[2], c6),
        sym6_quadform(rows[2], rows[2], c6),
    )


def sym6_inverse(c6, eps=0.0):
    """Adjugate inverse of sym6 -> sym6 (optionally Tikhonov-regularized)."""
    xx, xy, xz, yy, yz, zz = c6
    if eps:
        xx, yy, zz = xx + eps, yy + eps, zz + eps
    cof_xx = yy * zz - yz * yz
    cof_xy = xz * yz - xy * zz
    cof_xz = xy * yz - xz * yy
    cof_yy = xx * zz - xz * xz
    cof_yz = xy * xz - xx * yz
    cof_zz = xx * yy - xy * xy
    det = xx * cof_xx + xy * cof_xy + xz * cof_xz
    inv = 1.0 / jnp.where(det == 0, 1.0, det)
    inv = jnp.where(det == 0, 0.0, inv)
    return (cof_xx * inv, cof_xy * inv, cof_xz * inv,
            cof_yy * inv, cof_yz * inv, cof_zz * inv)


# ---- Mip-Splatting 3D filter (scene/gaussian_model.py:117-166) --------------


def scaling_with_3d_filter(scales, filter_3d):
    """sqrt(s^2 + f^2)  (gaussian_model.py:117-122)."""
    return jnp.sqrt(jnp.square(scales) + jnp.square(filter_3d))


def opacity_coef_3d_filter(scales, filter_3d):
    """Opacity compensation sqrt(det(S^2)/det(S^2 + f^2 I))
    (gaussian_model.py:143-154). filter_3d: (...,1).

    Computed as prod_i s_i/sqrt(s_i^2+f^2) — identical value, but the naive
    det quotient's backward divides by prod(s^2)^2, which underflows f32
    already at s ~ 5e-5 and yields NaN gradients."""
    s2 = jnp.square(scales)
    ratios = s2 / (s2 + jnp.square(filter_3d))
    return jnp.sqrt(jnp.prod(ratios, axis=-1))


def fuse_3d_filter(scales, opacity, filter_3d):
    """Fused getter (gaussian_model.py:157-166): returns (scales', opacity')."""
    s2 = jnp.square(scales)
    s2f = s2 + jnp.square(filter_3d)
    coef = jnp.sqrt(jnp.prod(s2 / s2f, axis=-1))
    return jnp.sqrt(s2f), opacity * coef[..., None]


def compute_3d_filter(xyz, cameras):
    """Per-point Mip 3D filter width (scene/gaussian_model.py:180-232).

    For every point: the minimum camera-space depth over all cameras where
    the point is in front (z > 0.2) and inside a 15%-padded image rectangle;
    invisible points get the max of visible distances. filter = min_z /
    max_focal * sqrt(0.2).

    cameras: list of core.camera.Camera (python loop: runs at setup time, not
    in the training hot loop — matches the reference's @torch.no_grad helper).
    Returns (P, 1).
    """
    P = xyz.shape[0]
    distance = jnp.full((P,), 1e5, jnp.float32)
    valid_any = jnp.zeros((P,), bool)
    focal_length = 0.0
    for cam in cameras:
        W, H = cam.width, cam.height
        focal_x = W / (2.0 * jnp.tan(cam.fovx / 2.0))
        focal_y = H / (2.0 * jnp.tan(cam.fovy / 2.0))
        Rw2c = jnp.asarray(cam.R, jnp.float32).T
        xyz_cam = xyz @ Rw2c.T + jnp.asarray(cam.T, jnp.float32)[None, :]
        z = xyz_cam[:, 2]
        valid_depth = z > 0.2
        zc = jnp.maximum(z, 0.001)
        x = xyz_cam[:, 0] / zc * focal_x + W / 2.0
        y = xyz_cam[:, 1] / zc * focal_y + H / 2.0
        in_screen = (x >= -0.15 * W) & (x <= 1.15 * W) & (y >= -0.15 * H) & (y <= 1.15 * H)
        valid = valid_depth & in_screen
        distance = jnp.where(valid, jnp.minimum(distance, zc), distance)
        valid_any = valid_any | valid
        focal_length = jnp.maximum(focal_length, focal_x)
    max_visible = jnp.max(jnp.where(valid_any, distance, -jnp.inf))
    # if nothing is visible at all, fall back to the 1e5 sentinel
    max_visible = jnp.where(jnp.isfinite(max_visible), max_visible, 1e5)
    distance = jnp.where(valid_any, distance, max_visible)
    filter_3d = distance / focal_length * (0.2**0.5)
    return filter_3d[:, None]

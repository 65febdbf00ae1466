"""Per-Gaussian preprocessing: projection, EWA 2D covariance with the
Mip-Splatting 2D filter, and RaDe-GS's ray-space plane / normal derivation.

This is the TPU-native equivalent of ``preprocessCUDA``
(cuda_rasterizer/forward.cu:307-423) and ``computeCov2D``
(forward.cu:77-264).  The reference's glm code is column-major; the algebra
below is the row-major decoding of the same math (verified against the
oracle tests in tests/test_projection.py):

- view transform & frustum cull (auxiliary.h:155-180): keep z_view > 0.2.
- EWA (forward.cu:85-124): cov2D = J W Sigma W^T J^T with the local affine
  Jacobian J evaluated at the cone-clamped view point, then the 2D Mip
  filter ``kernel_size`` added to the diagonal with opacity compensation
  coef = sqrt(det0/det1).
- Ray-space planes (forward.cu:135-262): with Sigma_cam^-1 = W Sigma^-1 W^T
  and the (clamped) normalized image coords (u, v):
      m   = Sigma_cam^-1 (u,v,1) / || . ||
      p   = nJ_inv ( m / <m,(u,v,1)> )          (2-vector)
  the per-Gaussian linearizations around the projected center are
      t(pixel)      = t_c + ray_plane . dpix            (ray-space distance)
      coord(pixel)  = view_point + camera_plane @ dpix  (camera space)
  and the analytic normal is the normalized image of (-p*l/nl, -1) under
  the inverse-ray Jacobian.

Everything is pure jnp: JAX autodiff provides the backward pass (replacing
backward.cu:145-628), with `where`-guards so culled/degenerate lanes produce
zero — not NaN — gradients.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from radegs_tpu.core.eigen import sym3x3_eigendecomposition, sym3x3_inverse
from radegs_tpu.core.gaussians import (
    covariance_sym6_comps,
    quat_to_rotmat_comps,
    sym6_inverse,
    sym6_matvec,
    sym6_quadform,
    sym6_rotate,
)
from radegs_tpu.core.sh import eval_sh_color

NEAR_PLANE = 0.2  # auxiliary.h:21
EIG_EPS = 1e-8  # forward.cu:142 well-conditioned threshold


@struct.dataclass
class PreprocessOut:
    """Per-Gaussian rasterization state (the reference's GeometryState,
    rasterizer_impl.cu:190-210)."""

    valid: Any  # (P,)   bool — survives culling and has nonzero extent
    xy: Any  # (P,2)  projected center, pixel coords
    depth: Any  # (P,)   view-space z (sort key)
    view_point: Any  # (P,3)  view-space center
    conic: Any  # (P,3)  inverse filtered 2D covariance (a, b, c)
    opacity: Any  # (P,)   opacity * mip coefficient
    rgb: Any  # (P,3)  SH-evaluated color
    camera_plane: Any  # (P,3,2)
    ray_plane: Any  # (P,2)
    normal: Any  # (P,3)  view-space unit normal
    ts: Any  # (P,)   ray-space distance of center
    radius: Any  # (P,)   float screen-space radius (0 when culled)
    well_conditioned: Any  # (P,) bool — Sigma invertible (integrate path)
    invraycov: Any = None  # (P,3,3) inverse ray-space covariance (integrate)


def ndc2pix(v, size):
    """auxiliary.h:55-58."""
    return ((v + 1.0) * size - 1.0) * 0.5


def _safe_normalize(v, axis=-1, eps=1e-30):
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    inv = jax_rsqrt(jnp.maximum(n2, eps))
    return v * inv, jnp.sqrt(n2)


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def preprocess_gaussians(
    means3d,
    scales,
    rotations,
    opacities,
    shs,
    sh_degree: int,
    camera,
    kernel_size: float = 0.0,
    scale_modifier: float = 1.0,
    colors_precomp=None,
    cov3d_precomp=None,
    active_sh_degree=None,
    compute_invraycov: bool = False,
) -> PreprocessOut:
    """Vectorized preprocess over P Gaussians (forward.cu:307-423).

    Args:
      means3d:   (P,3) world positions.
      scales:    (P,3) positive scales (already fused with the 3D filter).
      rotations: (P,4) unit quaternions (w,x,y,z).
      opacities: (P,1) or (P,) opacity in [0,1] (already mip-compensated).
      shs:       (P,M,3) SH coefficients (M >= (sh_degree+1)^2) or None.
      camera:    core.camera.Camera.
      kernel_size: 2D Mip filter strength (ModelParams.kernel_size).
      colors_precomp: optional (P,3) colors overriding SH evaluation.
      cov3d_precomp:  optional (P,3,3) world covariances overriding
                      scale/rotation (the pipe.compute_cov3D_python path).
    """
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    opac = opacities.reshape(means3d.shape[0]).astype(f32)

    W_img, H_img = camera.width, camera.height
    viewmat = camera.world_view
    full_proj = camera.full_proj
    Rw2c = viewmat[:3, :3]
    tvec = viewmat[:3, 3]
    fx, fy = camera.focal_x, camera.focal_y
    tanfovx, tanfovy = camera.tanfovx, camera.tanfovy

    # --- view transform + frustum cull (auxiliary.h:155-180) ---
    p_view = means3d @ Rw2c.T + tvec
    in_front = p_view[:, 2] > NEAR_PLANE
    z = jnp.where(in_front, p_view[:, 2], 1.0)  # safe z for the culled lanes

    # --- NDC projection (forward.cu:355-358) ---
    p_hom = means3d @ full_proj[:, :3].T + full_proj[:, 3]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    xy = jnp.stack([ndc2pix(p_proj[:, 0], W_img), ndc2pix(p_proj[:, 1], H_img)], axis=-1)

    # --- world covariance & its inverse (component/sym6 form: a (P,3,3)
    # tensor is lane-padded 3->128 on TPU, see quat_to_rotmat_comps) ---
    if cov3d_precomp is not None:
        cov3d_m = cov3d_precomp.astype(f32)
        eigval, eigvec, _ = sym3x3_eigendecomposition(cov3d_m)
        min_eig = eigval[:, 0]
        min_vec = (eigvec[:, 0, 0], eigvec[:, 1, 0], eigvec[:, 2, 0])
        vi = sym3x3_inverse(cov3d_m)
        vrk_inv_full = (vi[:, 0, 0], vi[:, 0, 1], vi[:, 0, 2],
                        vi[:, 1, 1], vi[:, 1, 2], vi[:, 2, 2])
        cov3d6 = (cov3d_m[:, 0, 0], cov3d_m[:, 0, 1], cov3d_m[:, 0, 2],
                  cov3d_m[:, 1, 1], cov3d_m[:, 1, 2], cov3d_m[:, 2, 2])
    else:
        R9 = quat_to_rotmat_comps(rotations.astype(f32))
        s = scales.astype(f32) * scale_modifier
        s2_arr = jnp.square(s)
        s2 = (s2_arr[:, 0], s2_arr[:, 1], s2_arr[:, 2])
        cov3d6 = covariance_sym6_comps(R9, s2)
        min_eig = jnp.min(s2_arr, axis=-1)
        # smallest principal axis = R column at argmin(s^2) (forward.cu:151)
        m0 = (s2[0] <= s2[1]) & (s2[0] <= s2[2])
        m1 = ~m0 & (s2[1] <= s2[2])
        min_vec = tuple(
            jnp.where(m0, R9[3 * r + 0], jnp.where(m1, R9[3 * r + 1], R9[3 * r + 2]))
            for r in range(3)
        )
        inv_s2 = tuple(1.0 / jnp.maximum(c, 1e-30) for c in s2)
        vrk_inv_full = covariance_sym6_comps(R9, inv_s2)

    well = min_eig > EIG_EPS  # forward.cu:142
    # ill-conditioned: project onto the smallest axis (forward.cu:151-155)
    vrk_inv = tuple(
        jnp.where(well, f, min_vec[i] * min_vec[j])
        for f, (i, j) in zip(vrk_inv_full, ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)))
    )

    # --- EWA cov2D with cone clamp (forward.cu:85-124) ---
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    u = jnp.clip(p_view[:, 0] / z, -limx, limx)
    v = jnp.clip(p_view[:, 1] / z, -limy, limy)
    tx, ty = u * z, v * z

    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    # J rows for (x_img, y_img); M = J @ Rw2c as two component 3-tuples
    j00, j02 = fx * inv_z, -fx * tx * inv_z2
    j11, j12 = fy * inv_z, -fy * ty * inv_z2
    m_row0 = tuple(j00 * Rw2c[0, k] + j02 * Rw2c[2, k] for k in range(3))
    m_row1 = tuple(j11 * Rw2c[1, k] + j12 * Rw2c[2, k] for k in range(3))
    a0 = sym6_quadform(m_row0, m_row0, cov3d6)
    b0 = sym6_quadform(m_row0, m_row1, cov3d6)
    c0 = sym6_quadform(m_row1, m_row1, cov3d6)
    det0 = jnp.maximum(1e-6, a0 * c0 - b0 * b0)
    a1, c1 = a0 + kernel_size, c0 + kernel_size
    det1m = jnp.maximum(1e-6, a1 * c1 - b0 * b0)
    coef = jnp.sqrt(det0 / (det1m + 1e-6) + 1e-6)
    coef = jnp.where((det0 <= 1e-6) | (det1m <= 1e-6), 0.0, coef)  # forward.cu:122-124

    det = a1 * c1 - b0 * b0
    nonsingular = det != 0.0  # forward.cu:385-387
    det_safe = jnp.where(nonsingular, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([c1 * det_inv, -b0 * det_inv, a1 * det_inv], axis=-1)

    # --- screen-space radius (forward.cu:391-398) ---
    mid = 0.5 * (a1 + c1)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = jnp.maximum(mid + disc, mid - disc)
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    # --- ray-space planes & normal (forward.cu:135-262) ---
    cam_inv6 = sym6_rotate(jnp.asarray(Rw2c), vrk_inv)
    uvh = (u, v, jnp.ones_like(u))
    m = sym6_matvec(cam_inv6, uvh)
    mn2 = m[0] * m[0] + m[1] * m[1] + m[2] * m[2]
    mn_norm = jnp.sqrt(mn2)
    inv_mn = jax_rsqrt(jnp.maximum(mn2, 1e-30))
    uvh_mn = tuple(c * inv_mn for c in m)
    plane_ok = (mn_norm > 1e-20) & jnp.isfinite(mn_norm)

    vbn = uvh_mn[0] * uvh[0] + uvh_mn[1] * uvh[1] + uvh_mn[2] * uvh[2]
    inv_vbn = 1.0 / jnp.maximum(vbn, 1e-7)
    mvec = tuple(c * inv_vbn for c in uvh_mn)
    u2, v2_, uv = u * u, v * v, u * v
    plane0 = (v2_ + 1.0) * mvec[0] - uv * mvec[1] - u * mvec[2]
    plane1 = -uv * mvec[0] + (u2 + 1.0) * mvec[1] - v * mvec[2]

    nl = u2 + v2_ + 1.0
    l_clamped = jnp.sqrt(tx * tx + ty * ty + z * z)
    inv_nlfx = 1.0 / (nl * fx)
    inv_nlfy = 1.0 / (nl * fy)
    cp = jnp.stack(
        [
            jnp.stack(
                [
                    (-(v2_ + 1.0) * z + plane0 * tx) * inv_nlfx,
                    (uv * z + plane1 * tx) * inv_nlfy,
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    (uv * z + plane0 * ty) * inv_nlfx,
                    (-(u2 + 1.0) * z + plane1 * ty) * inv_nlfy,
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    (tx + plane0 * z) * inv_nlfx,
                    (ty + plane1 * z) * inv_nlfy,
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )  # (P,3,2)
    ray_plane = jnp.stack(
        [plane0 * l_clamped * inv_nlfx, plane1 * l_clamped * inv_nlfy], axis=-1
    )

    factor = l_clamped / nl
    cam_normal = jnp.stack(
        [
            -plane0 * factor * inv_z - tx / l_clamped,
            -plane1 * factor * inv_z - ty / l_clamped,
            (plane0 * tx + plane1 * ty) * factor * inv_z2 - z / l_clamped,
        ],
        axis=-1,
    )
    normal, _ = _safe_normalize(cam_normal)

    zero3 = jnp.zeros_like(normal)
    normal = jnp.where(plane_ok[:, None], normal, zero3)
    cp = jnp.where(plane_ok[:, None, None], cp, jnp.zeros_like(cp))
    ray_plane = jnp.where(plane_ok[:, None], ray_plane, jnp.zeros_like(ray_plane))

    # --- color ---
    if colors_precomp is not None:
        rgb = colors_precomp.astype(f32)
    else:
        rgb, _ = eval_sh_color(
            sh_degree, shs.astype(f32), means3d, camera.camera_center,
            active_degree=active_sh_degree,
        )

    ts = jnp.linalg.norm(p_view, axis=-1)  # forward.cu:381

    # --- inverse ray-space covariance for the integrate path ---
    # (the INTE branch of computeCov2D, forward.cu:187-235, derived from
    # first principles: ray space r(p) = (fx x/z + cx, fy y/z + cy, |p|),
    # invraycov = (J_r Sigma_view J_r^T)^-1 at the cone-clamped center.
    # NOTE the reference's ill-conditioned branch assigns a shadowed local
    # (forward.cu:214 declares a NEW inv_cov_ray) so its output there is
    # uninitialized memory; with the Mip 3D filter Sigma is never degenerate,
    # and we use an eigenvalue-clamped inverse for that (dead) branch instead.
    invraycov = None
    if compute_invraycov:
        zero = jnp.zeros_like(z)
        jr0 = (j00, zero, j02)
        jr1 = (zero, j11, j12)
        jr2 = (tx / l_clamped, ty / l_clamped, z / l_clamped)
        v_view6 = sym6_rotate(jnp.asarray(Rw2c), cov3d6)
        # rows of J V: (J V J^T)_ij = jr_i . V jr_j
        ray6 = (
            sym6_quadform(jr0, jr0, v_view6),
            sym6_quadform(jr0, jr1, v_view6),
            sym6_quadform(jr0, jr2, v_view6),
            sym6_quadform(jr1, jr1, v_view6),
            sym6_quadform(jr1, jr2, v_view6),
            sym6_quadform(jr2, jr2, v_view6),
        )
        reg = jnp.where(well, 0.0, 1e-6)
        inv6 = sym6_inverse(tuple(
            c + (reg if k in (0, 3, 5) else 0.0) for k, c in enumerate(ray6)
        ))
        ixx, ixy, ixz, iyy, iyz, izz = inv6
        invraycov = jnp.stack(
            [jnp.stack([ixx, ixy, ixz], -1), jnp.stack([ixy, iyy, iyz], -1),
             jnp.stack([ixz, iyz, izz], -1)],
            axis=-2,
        )

    valid = in_front & nonsingular & (radius > 0)
    radius = jnp.where(valid, radius, 0.0)

    return PreprocessOut(
        valid=valid,
        xy=xy,
        depth=p_view[:, 2],
        view_point=p_view,
        conic=conic,
        opacity=opac * coef,
        rgb=rgb,
        camera_plane=cp,
        ray_plane=ray_plane,
        normal=normal,
        ts=ts,
        radius=radius,
        well_conditioned=well,
        invraycov=invraycov,
    )

"""Closed-form symmetric 3x3 eigendecomposition.

Replaces the reference's iterative Householder+QL solver
(cuda_rasterizer/auxiliary.h:182-402 ``glm_modification::findEigenvaluesSymReal``)
with the analytic trigonometric method — branchless, fixed op count, and
vmap/XLA friendly.  Used only where the scale/rotation factorization of the
covariance is unavailable (precomputed cov3D inputs, the degenerate ray-space
covariance branch of the integrate kernel); the main training path derives
eigenvalues directly from (scales, rotation).
"""

from __future__ import annotations

import jax.numpy as jnp


def sym3x3_eigenvalues(A):
    """Eigenvalues of symmetric (...,3,3), ascending. Trig method (Smith 1961)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # det(B)/2 where B = (A - qI)
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = detB / (2.0 * p * p * p)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = q + 2.0 * p * jnp.cos(phi)  # largest
    e1 = 3.0 * q - e0 - e2
    return jnp.stack([e0, e1, e2], axis=-1)


def _eigenvector(A, lam, fallback):
    """Eigenvector for eigenvalue lam of symmetric 3x3 via cross products of
    rows of (A - lam I); picks the most numerically stable cross product."""
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.stack([n01, n02, n12], axis=-1).argmax(axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(cand, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = nrm[..., 0] > 1e-20
    v = jnp.where(ok[..., None], v / jnp.maximum(nrm, 1e-30), fallback)
    return v, ok


def sym3x3_eigendecomposition(A):
    """Full eigendecomposition of symmetric (...,3,3).

    Returns (eigenvalues asc (...,3), eigenvectors (...,3,3) with
    eigenvectors[..., :, k] for eigenvalue k, ok mask). Degenerate (repeated
    eigenvalue) inputs complete the basis by orthogonalization.
    """
    lam = sym3x3_eigenvalues(A)
    ex = jnp.zeros(A.shape[:-2] + (3,), A.dtype).at[..., 0].set(1.0)
    ey = jnp.zeros(A.shape[:-2] + (3,), A.dtype).at[..., 1].set(1.0)
    v0, ok0 = _eigenvector(A, lam[..., 0], ex)
    v2, ok2 = _eigenvector(A, lam[..., 2], ey)
    # make v2 orthogonal to v0 (robust when lam1 ~ lam2)
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    alt = jnp.cross(v0, ex)
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v0, ey)
    alt = jnp.where(alt_n > 1e-6, alt, alt2)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-30)
    v2 = jnp.where(n2 > 1e-6, v2 / jnp.maximum(n2, 1e-30), alt)
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return lam, V, ok0 & ok2


def sym3x3_inverse(A, eps=1e-30):
    """Adjugate-based inverse of symmetric (...,3,3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    A11 = d * f - e * e
    A12 = c * e - b * f
    A13 = b * e - c * d
    A22 = a * f - c * c
    A23 = b * c - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    row0 = jnp.stack([A11, A12, A13], axis=-1)
    row1 = jnp.stack([A12, A22, A23], axis=-1)
    row2 = jnp.stack([A13, A23, A33], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]

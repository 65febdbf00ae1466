"""Spherical-harmonics color evaluation (degrees 0..3).

Semantics match the reference GPU evaluator
(cuda_rasterizer/forward.cu:23-74 ``computeColorFromSH``) and the python
oracle (utils/sh_utils.py:57-110): colors are ``SH(dir) + 0.5`` clamped to
be non-negative, with the clamp mask recorded for the backward pass.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def rgb2sh(rgb):
    return (rgb - 0.5) / SH_C0


def sh2rgb(sh):
    return sh * SH_C0 + 0.5


def sh_basis(degree: int, dirs):
    """Real SH basis values for unit directions. dirs: (..., 3) -> (..., (deg+1)^2)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [SH_C0 * one]
    if degree >= 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(degree: int, sh, dirs):
    """Evaluate SH color.

    Args:
      degree: active SH degree (0..3); coefficients beyond it are ignored.
      sh:   (..., M, 3) coefficients, M >= (degree+1)^2.
      dirs: (..., 3) unit view directions (gaussian center - camera).

    Returns: (..., 3) raw color *before* the +0.5 shift.
    """
    basis = sh_basis(degree, dirs)  # (..., K)
    k = basis.shape[-1]
    return jnp.einsum("...k,...kc->...c", basis, sh[..., :k, :])


def eval_sh_color(degree: int, sh, means, campos, active_degree=None):
    """Full reference semantics (forward.cu:23-74): returns (rgb, clamped).

    rgb is max(SH + 0.5, 0); clamped marks channels that were clipped (the
    reference zeroes their gradients in the backward pass, backward.cu:21-140 —
    here the clamp itself gives the identical VJP automatically).

    ``active_degree``: optional *traced* degree <= ``degree``; coefficients
    beyond (active_degree+1)^2 are masked out. This keeps one compiled graph
    while the training loop raises the SH degree every 1000 iterations
    (train.py:112-113).
    """
    dirs = means - campos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = sh_basis(degree, dirs)  # (..., K)
    if active_degree is not None:
        k = basis.shape[-1]
        idx = jnp.arange(k)
        basis = basis * (idx < (active_degree + 1) ** 2)
    raw = jnp.einsum("...k,...kc->...c", basis, sh[..., : basis.shape[-1], :]) + 0.5
    return jnp.maximum(raw, 0.0), raw < 0.0

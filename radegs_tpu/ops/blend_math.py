"""Shared alpha-blending math for all renderer implementations.

Semantics from cuda_rasterizer/forward.cu:428-693 (renderCUDA), expressed in
a *parallel* form: instead of the sequential front-to-back loop, alpha and
transmittance are computed for all contributors at once with an (exclusive)
cumulative product, which maps onto the TPU VPU.  The sequential skip/
early-termination rules are reproduced exactly:

- power > 0                     -> skipped (forward.cu:556-558)
- alpha = min(0.99, op*exp(power)) < 1/255 -> skipped (forward.cu:565-567)
- first contributor where T*(1-alpha) < 1e-4 terminates the pixel; that
  contributor and everything behind it is excluded (forward.cu:568-573).

Since T decreases monotonically only through *included* contributors, the
cumulative product over candidate alphas equals the sequential T for every
index at or before the termination point, so the parallel formulation is
exact (not an approximation).
"""

from __future__ import annotations

import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99
NORMALIZE_EPS = 1e-12  # auxiliary.h:23


def gaussian_alpha(xy, conic, opacity, pix):
    """Per (gaussian, pixel) raw alpha and candidacy.

    xy:      (..., 2) projected centers
    conic:   (..., 3)
    opacity: (...,)
    pix:     (..., 2) pixel coords (broadcastable against xy)
    Returns (alpha, candidate_mask) with alpha already zeroed for
    non-candidates.
    """
    d = xy - pix
    dx, dy = d[..., 0], d[..., 1]
    power = -0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy) - conic[..., 1] * dx * dy
    alpha = jnp.minimum(MAX_ALPHA, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    candidate = (power <= 0.0) & (alpha >= ALPHA_EPS)
    return jnp.where(candidate, alpha, 0.0), candidate


def transmittance_weights(alpha, axis=0, t_init=None):
    """Given depth-ordered alphas (zeros for skipped contributors), compute:

    - include: contributors actually blended (before early termination)
    - w:       blending weights alpha_i * T_i
    - t_prefix: transmittance before each contributor
    - t_final: transmittance after the last included contributor

    `axis` is the depth-ordered contributor axis. `t_init` optionally carries
    transmittance from earlier chunks (for chunked evaluation).
    """
    one_minus = 1.0 - alpha
    t_prefix = jnp.cumprod(one_minus, axis=axis) / one_minus  # exclusive
    # cumprod/x is exact only when x != 0; alpha<=0.99 so one_minus >= 0.01
    if t_init is not None:
        t_prefix = t_prefix * t_init
    test_t = t_prefix * one_minus
    terminate = (alpha > 0.0) & (test_t < T_EPS)
    kill = jnp.cumsum(terminate.astype(jnp.int32), axis=axis) > 0  # inclusive
    include = (alpha > 0.0) & ~kill
    w = jnp.where(include, alpha * t_prefix, 0.0)
    t_final = jnp.prod(jnp.where(include, one_minus, 1.0), axis=axis)
    if t_init is not None:
        t_final = t_final * t_init
    return include, w, t_prefix, t_final

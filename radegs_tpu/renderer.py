"""Renderer dispatch — the L3 layer (gaussian_renderer/__init__.py:19-95).

Takes a GaussianState + Camera, applies the fused Mip 3D-filter getters,
runs preprocess + rasterize, and returns the reference's render() dict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.models.gaussian_model import GaussianState
from radegs_tpu.ops.binning import default_instance_budget
from radegs_tpu.ops.rasterize import rasterize


def render(
    state: GaussianState,
    camera,
    bg,
    kernel_size: float = 0.0,
    scaling_modifier: float = 1.0,
    max_per_tile: int = 512,
    instance_budget: int | None = None,
    xy_offset=None,
    xy_abs=None,
    backend: str | None = None,
):
    """Render a view. Mirrors gaussian_renderer/__init__.py:19-95: always
    uses the fused filtered scales+opacity (line 63) and GPU-side SH eval.

    ``xy_offset``/``xy_abs``: optional (C,2) zero tensors; gradients w.r.t.
    them yield the screen-space mean gradients (pixel units) and the GOF
    absolute-gradient statistic — the reference's means2D .grad side channel
    (gaussian_renderer/__init__.py:29-33).
    """
    scales, opacity = state.get_fused_scaling_opacity()
    opacity = jnp.where(state.active[:, None], opacity, 0.0)

    prep = preprocess_gaussians(
        state.params.xyz,
        scales,
        state.get_rotation(),
        opacity,
        state.get_features(),
        sh_degree=state.max_sh_degree,
        camera=camera,
        kernel_size=kernel_size,
        scale_modifier=scaling_modifier,
        active_sh_degree=state.active_sh_degree,
    )
    prep = prep.replace(valid=prep.valid & state.active)
    if xy_offset is not None:
        prep = prep.replace(xy=prep.xy + xy_offset)
    if instance_budget is None:
        instance_budget = default_instance_budget(state.capacity)
    out = rasterize(
        prep,
        camera,
        bg,
        max_per_tile=max_per_tile,
        instance_budget=instance_budget,
        xy_abs=xy_abs,
        backend=backend,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "scaling_modifier", "max_per_tile",
                     "instance_budget", "backend"),
)
def render_compiled(state, camera, bg, kernel_size=0.0, scaling_modifier=1.0,
                    max_per_tile=512, instance_budget=None, backend=None):
    """Jitted render() for offline/batch callers. Eager (op-by-op) execution
    pays per-op dispatch latency — ~40s/view through a remote TPU tunnel vs
    ~0.1s compiled."""
    out = render(state, camera, bg, kernel_size=kernel_size,
                 scaling_modifier=scaling_modifier, max_per_tile=max_per_tile,
                 instance_budget=instance_budget, backend=backend)
    out.pop("binning", None)
    return out


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "max_per_tile", "instance_budget")
)
def integrate_compiled(points3d, state, camera, bg, kernel_size=0.0,
                       max_per_tile=1024, instance_budget=None):
    """Jitted integrate() (fixed point-chunk shapes avoid recompiles)."""
    out = integrate(points3d, state, camera, bg, kernel_size=kernel_size,
                    max_per_tile=max_per_tile, instance_budget=instance_budget)
    out.pop("binning", None)
    return out


def _integrate_prep(state: GaussianState, camera, kernel_size):
    scales, opacity = state.get_fused_scaling_opacity()
    opacity = jnp.where(state.active[:, None], opacity, 0.0)
    prep = preprocess_gaussians(
        state.params.xyz, scales, state.get_rotation(), opacity,
        state.get_features(), sh_degree=state.max_sh_degree, camera=camera,
        kernel_size=kernel_size, active_sh_degree=state.active_sh_degree,
        compute_invraycov=True,
    )
    return prep.replace(valid=prep.valid & state.active)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "max_per_tile", "instance_budget")
)
def integrate_prepare_compiled(state, camera, bg, kernel_size=0.0,
                               max_per_tile=1024, instance_budget=None):
    """Points-independent half of integrate(): preprocess + binning +
    phase-A image + median plane, reusable across point sets (the tetra
    extractor's binary search re-evaluates 1+8 point sets per view)."""
    from radegs_tpu.ops.integrate import integrate_view_cache

    prep = _integrate_prep(state, camera, kernel_size)
    if instance_budget is None:
        instance_budget = default_instance_budget(state.capacity)
    cache = integrate_view_cache(prep, camera, bg,
                                 max_per_tile=max_per_tile,
                                 instance_budget=instance_budget)
    return prep, cache


@jax.jit
def integrate_points_compiled(points3d, prep, cache, camera):
    """Phase B against a prepared cache; same outputs as integrate()."""
    from radegs_tpu.ops.integrate import integrate_points_cached

    W, H = camera.width, camera.height
    out_color, pts, a_int, sdf, _ = integrate_points_cached(
        points3d, prep, cache, camera
    )
    col_flat = out_color[0:3].reshape(3, H * W).T
    pix_idx = jnp.where(pts.valid, pts.pixel[:, 1] * W + pts.pixel[:, 0], 0)
    color_integrated = jnp.where(pts.valid[:, None], col_flat[pix_idx], 0.0)
    return {
        "render": out_color,
        "alpha_integrated": a_int,
        "color_integrated": color_integrated,
        "point_coordinate": pts.xy,
        "point_sdf": sdf,
        "point_valid": pts.valid,
    }


def mark_visible(state: GaussianState, camera):
    """Frustum visibility mask (the reference's markVisible utility,
    rasterizer_impl.cu:176-188 / diff_gaussian_rasterization __init__.py:
    193-202): view-space z > NEAR_PLANE."""
    from radegs_tpu.core.projection import NEAR_PLANE

    viewmat = camera.world_view
    p_view = state.params.xyz @ viewmat[:3, :3].T + viewmat[:3, 3]
    return (p_view[:, 2] > NEAR_PLANE) & state.active


def integrate(
    points3d,
    state: GaussianState,
    camera,
    bg,
    kernel_size: float = 0.0,
    max_per_tile: int = 1024,
    instance_budget: int | None = None,
):
    """Point-opacity integration (gaussian_renderer/__init__.py:98-195):
    same preprocess as render() — filtered scales + filtered opacity — plus
    the inverse ray-space covariance for 3D opacity evaluation."""
    from radegs_tpu.ops.integrate import integrate as integrate_op

    scales, opacity = state.get_fused_scaling_opacity()
    opacity = jnp.where(state.active[:, None], opacity, 0.0)
    prep = preprocess_gaussians(
        state.params.xyz,
        scales,
        state.get_rotation(),
        opacity,
        state.get_features(),
        sh_degree=state.max_sh_degree,
        camera=camera,
        kernel_size=kernel_size,
        active_sh_degree=state.active_sh_degree,
        compute_invraycov=True,
    )
    prep = prep.replace(valid=prep.valid & state.active)
    if instance_budget is None:
        instance_budget = default_instance_budget(state.capacity)
    return integrate_op(
        points3d, prep, camera, bg,
        max_per_tile=max_per_tile, instance_budget=instance_budget,
    )

"""Slow-but-exact reference renderer (the test oracle).

Evaluates every Gaussian at every pixel (no tile binning), reproducing the
sequential semantics of cuda_rasterizer/forward.cu:428-693 including the
tile-visibility rule: a pixel only sees Gaussians whose screen-space bounding
rectangle covers the pixel's tile (rasterizer_impl.cu:70-111 binning).  Fully
differentiable; memory scales as O(H*W*P) so use on small scenes only.
"""

from __future__ import annotations

import jax.numpy as jnp

from radegs_tpu.core.projection import PreprocessOut
from radegs_tpu.ops.blend_math import (
    NORMALIZE_EPS,
    gaussian_alpha,
    transmittance_weights,
)

TILE = 16  # config.h:16-17


def tile_rect(xy, radius, tiles_x, tiles_y, tile=TILE):
    """Tile-space bounding rect [min, max) per Gaussian (auxiliary.h:62-72).

    Exclusive max = tile of the last covered coordinate + 1 — matching
    ops.binning.gaussian_rects. (The reference's (x+r+BLOCK-1)/BLOCK trick
    is equivalent for its integer radii but under-covers for our float
    extents when (x+r) mod tile < 1.)"""
    rx_min = jnp.clip(jnp.floor((xy[..., 0] - radius) / tile), 0, tiles_x).astype(jnp.int32)
    ry_min = jnp.clip(jnp.floor((xy[..., 1] - radius) / tile), 0, tiles_y).astype(jnp.int32)
    rx_max = jnp.clip(
        jnp.floor((xy[..., 0] + radius) / tile) + 1, 0, tiles_x
    ).astype(jnp.int32)
    ry_max = jnp.clip(
        jnp.floor((xy[..., 1] + radius) / tile) + 1, 0, tiles_y
    ).astype(jnp.int32)
    return rx_min, ry_min, rx_max, ry_max


def render_reference(
    prep: PreprocessOut,
    width: int,
    height: int,
    focal_x,
    focal_y,
    bg,
    tile: int = TILE,
):
    """Render all output maps. Returns a dict matching the reference's
    rasterizer outputs (diff_gaussian_rasterization/__init__.py:101):
    render (3,H,W), alpha (1,H,W), coord/mcoord (3,H,W), depth/mdepth (1,H,W),
    normal (3,H,W) — plus the unnormalized accumulators used by the backward.
    """
    P = prep.xy.shape[0]
    H, W = height, width
    tiles_x = (W + tile - 1) // tile
    tiles_y = (H + tile - 1) // tile

    # depth-sort (invalid to the back). lax.sort is ascending, stable.
    sort_depth = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    xy = prep.xy[order]
    conic = prep.conic[order]
    opac = jnp.where(prep.valid, prep.opacity, 0.0)[order]
    rgb = prep.rgb[order]
    cplane = prep.camera_plane[order]
    rplane = prep.ray_plane[order]
    normal_g = prep.normal[order]
    ts_g = prep.ts[order]
    vpt = prep.view_point[order]
    radius = jnp.where(prep.valid, prep.radius, 0.0)[order]

    px = jnp.arange(W, dtype=jnp.float32)
    py = jnp.arange(H, dtype=jnp.float32)
    pix = jnp.stack(
        [
            jnp.broadcast_to(px[None, :], (H, W)).reshape(-1),
            jnp.broadcast_to(py[:, None], (H, W)).reshape(-1),
        ],
        axis=-1,
    )  # (HW, 2)

    # tile-visibility: pixel's tile inside the Gaussian's rect
    rx_min, ry_min, rx_max, ry_max = tile_rect(xy, radius, tiles_x, tiles_y, tile)
    ptx = (pix[:, 0] // tile).astype(jnp.int32)  # (HW,)
    pty = (pix[:, 1] // tile).astype(jnp.int32)
    in_rect = (
        (ptx[:, None] >= rx_min[None, :])
        & (ptx[:, None] < rx_max[None, :])
        & (pty[:, None] >= ry_min[None, :])
        & (pty[:, None] < ry_max[None, :])
    )  # (HW, P)

    alpha, _ = gaussian_alpha(
        xy[None, :, :], conic[None, :, :], opac[None, :], pix[:, None, :]
    )  # (HW, P)
    alpha = jnp.where(in_rect, alpha, 0.0)

    include, w, t_prefix, t_final = transmittance_weights(alpha, axis=1)

    weight = jnp.sum(w, axis=1)  # (HW,)
    color = w @ rgb + t_final[:, None] * bg[None, :]

    # expected depth: t = ts + ray_plane . d  (forward.cu:596-604)
    d = xy[None, :, :] - pix[:, None, :]  # (HW, P, 2)
    t_ray = ts_g[None, :] + d[..., 0] * rplane[None, :, 0] + d[..., 1] * rplane[None, :, 1]
    accum_depth_raw = jnp.sum(w * t_ray, axis=1)

    # expected camera-space coordinate (forward.cu:581-595)
    coord_pt = (
        vpt[None, :, :]
        + cplane[None, :, :, 0] * d[..., 0:1]
        + cplane[None, :, :, 1] * d[..., 1:2]
    )  # (HW, P, 3)
    accum_coord = jnp.sum(w[..., None] * coord_pt, axis=1)

    normal_accum = w @ normal_g  # (HW, 3)

    # median = last included contributor with T > 0.5 (forward.cu:580,591,603)
    med_mask = include & (t_prefix > 0.5)
    idx = jnp.arange(P)[None, :]
    med_idx = jnp.max(jnp.where(med_mask, idx, -1), axis=1)  # (HW,)
    has_med = med_idx >= 0
    med_safe = jnp.maximum(med_idx, 0)
    m_t = jnp.take_along_axis(t_ray, med_safe[:, None], axis=1)[:, 0]
    m_t = jnp.where(has_med, m_t, 0.0)
    m_coord = jnp.take_along_axis(coord_pt, med_safe[:, None, None], axis=1)[:, 0, :]
    m_coord = jnp.where(has_med[:, None], m_coord, 0.0)

    any_contrib = jnp.any(include, axis=1)

    # distance -> depth conversion (forward.cu:466-467,662-672)
    pixnf_x = (pix[:, 0] - W / 2.0) / focal_x
    pixnf_y = (pix[:, 1] - H / 2.0) / focal_y
    ln = jnp.sqrt(pixnf_x**2 + pixnf_y**2 + 1.0)

    # double-where guards so empty pixels give zero (not NaN) gradients
    w_safe = jnp.where(any_contrib, weight, 1.0)
    inv_w = jnp.where(any_contrib, 1.0 / w_safe, 0.0)
    accum_depth = accum_depth_raw / ln
    out_depth = accum_depth * inv_w
    out_mdepth = m_t / ln

    out_coord = accum_coord * inv_w[:, None]

    n2 = jnp.sum(jnp.square(normal_accum), axis=-1)
    n_len = jnp.sqrt(jnp.where(any_contrib, n2, 1.0))
    normal_length = jnp.where(any_contrib, n_len, 1.0)
    out_normal = jnp.where(
        any_contrib[:, None],
        normal_accum / jnp.maximum(n_len, NORMALIZE_EPS)[:, None],
        0.0,
    )

    def img(x, c):
        return x.reshape(H, W, c).transpose(2, 0, 1)

    return {
        "render": img(color, 3),
        "alpha": img(weight, 1),
        "expected_depth": img(out_depth, 1),
        "median_depth": img(out_mdepth, 1),
        "expected_coord": img(out_coord, 3),
        "median_coord": img(m_coord, 3),
        "normal": img(out_normal, 3),
        "accum_depth": img(accum_depth, 1),
        "accum_coord": img(accum_coord, 3),
        "normal_length": img(normal_length, 1),
        "t_final": img(t_final, 1),
    }

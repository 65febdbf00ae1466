"""The differentiable tile rasterizer (XLA path) with a custom VJP.

Design (vs. the reference CUDA kernels):

- forward = ``renderCUDA`` (forward.cu:428-693), but vectorized: the image is
  cut into 16x16 tiles laid out as a (T, 256) pixel axis; the per-tile
  Gaussian list (from ops.binning) is streamed in depth-ordered chunks by a
  ``lax.scan`` whose carry holds per-pixel transmittance and accumulators.
  Within a chunk, sequential blending is replaced by an exclusive cumulative
  product of (1 - alpha) — mathematically identical (see ops.blend_math).

- TPU layout rule: f32 arrays are tiled (8, 128) over their last two dims,
  so a large array with a trailing dim of 2 or 3 is padded 42-64x in HBM.
  Every big intermediate here is therefore laid out channels-LEADING with
  the pixel axis minor: vectors are (3, T, px) / (3, T, c, px), scalars
  (T, px) / (T, c, px).  Only small per-(tile, contributor) tensors
  (T, c, k) keep a tiny trailing dim.

- the custom VJP boundary is drawn around the *raw accumulators only*:
  weight normalization, distance->depth division, background compositing and
  normal normalization happen outside in plain jnp, so JAX autodiff supplies
  the corresponding corrections that backward.cu:737-779 hand-derives.

- backward = ``BACKWARD::renderCUDA`` (backward.cu:631-1016), except we
  re-scan *front-to-back* (recomputing alpha exactly as the forward did) and
  obtain each contributor's "everything behind me" sums as
  (total - inclusive-prefix), where the totals are the saved forward
  accumulators.  Gradient scatter uses ``.at[].add`` segment sums instead of
  atomicAdd — deterministic, unlike the reference (SURVEY.md §5.2).

- the GOF densification side-channel (backward.cu:1002-1006) is exposed as
  the cotangent of an explicit dummy input ``xy_abs`` instead of a dummy
  tensor's ``.grad``: per pixel-contribution
  |dL_dG * dG_ddelx * W/2| + |dL_dG * dG_ddely * H/2| (NDC scale).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from radegs_tpu.core.projection import PreprocessOut
from radegs_tpu.ops.binning import TileBinning, bin_gaussians, default_instance_budget, tile_grid

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99
NORMALIZE_EPS = 1e-12


class RasterCfg(NamedTuple):
    """Static rasterization configuration (hashable; keys the jit cache)."""

    width: int
    height: int
    tile: int = 16
    chunk: int = 8
    backend: str = "xla"  # "xla" | "pallas" | "pallas_interpret"


def _tile_pixel_coords(cfg: RasterCfg):
    """Two (T, px) arrays of pixel-center x/y for every tile (row-major
    tiles, row-major pixels inside a tile) — the analogue of the CUDA
    block/thread indexing. Kept as separate scalars (TPU layout rule)."""
    tiles_x, tiles_y = tile_grid(cfg.width, cfg.height, cfg.tile)
    t = jnp.arange(tiles_x * tiles_y)
    tx, ty = t % tiles_x, t // tiles_x
    i = jnp.arange(cfg.tile * cfg.tile)
    ix, iy = i % cfg.tile, i // cfg.tile
    px = tx[:, None] * cfg.tile + ix[None, :]
    py = ty[:, None] * cfg.tile + iy[None, :]
    return px.astype(jnp.float32), py.astype(jnp.float32)


def _untile(x, cfg: RasterCfg):
    """(C, T, px) -> (C, H, W), cropping the tile padding."""
    tiles_x, tiles_y = tile_grid(cfg.width, cfg.height, cfg.tile)
    C = x.shape[0]
    img = x.reshape(C, tiles_y, tiles_x, cfg.tile, cfg.tile)
    img = img.transpose(0, 1, 3, 2, 4).reshape(C, tiles_y * cfg.tile, tiles_x * cfg.tile)
    return img[:, : cfg.height, : cfg.width]


def _gather(arr, ids):
    """Gather rows of (P, ...) by (T, c) ids (already clipped to valid range)."""
    return jnp.take(arr, ids, axis=0)


def _gather_t(arr, ids):
    """Gather (P, k) rows by (T, c) ids, channels-leading: -> (k, T, c)."""
    return jnp.moveaxis(jnp.take(arr, ids, axis=0), -1, 0)


def _chunk_alpha(ids, mask, xy, conic, opacity, pix_x, pix_y):
    """alpha (T, c, px) for one chunk, reproducing forward.cu:550-567.
    Returns (alpha, dx, dy, falloff, raw_alpha), all (T, c, px)."""
    xy_g = _gather(xy, ids)  # (T,c,2)
    con_g = _gather(conic, ids)  # (T,c,3)
    op_g = _gather(opacity, ids)  # (T,c)
    dx = xy_g[..., 0, None] - pix_x[:, None, :]  # (T,c,px)
    dy = xy_g[..., 1, None] - pix_y[:, None, :]
    power = (
        -0.5 * (con_g[..., 0, None] * dx * dx + con_g[..., 2, None] * dy * dy)
        - con_g[..., 1, None] * dx * dy
    )
    g = jnp.exp(jnp.minimum(power, 0.0))
    raw = op_g[..., None] * g
    alpha = jnp.minimum(MAX_ALPHA, raw)
    cand = (power <= 0.0) & (alpha >= ALPHA_EPS) & mask[..., None]
    return jnp.where(cand, alpha, 0.0), dx, dy, g, raw


def _chunk_geometry(ids, dx, dy, view_point, camera_plane, ray_plane, ts):
    """Per-contributor ray-space distance (T,c,px) and camera-space
    coordinate (3,T,c,px) (forward.cu:581-604)."""
    ts_g = _gather(ts, ids)  # (T,c)
    rp_g = _gather(ray_plane, ids)  # (T,c,2)
    vp_t = _gather_t(view_point, ids)  # (3,T,c)
    cp_g = _gather(camera_plane, ids)  # (T,c,3,2)
    cpx_t = jnp.moveaxis(cp_g[..., 0], -1, 0)  # (3,T,c)
    cpy_t = jnp.moveaxis(cp_g[..., 1], -1, 0)
    t_ray = ts_g[..., None] + rp_g[..., 0, None] * dx + rp_g[..., 1, None] * dy
    coord = (
        vp_t[..., None]
        + cpx_t[..., None] * dx[None]
        + cpy_t[..., None] * dy[None]
    )  # (3,T,c,px)
    return t_ray, coord, rp_g, cpx_t, cpy_t


# =============================================================== forward ====


def _blend_forward_scan(cfg: RasterCfg, tile_gauss, inputs):
    """Returns raw accumulators per (tile, pixel), channels-leading."""
    xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts = inputs
    T_tiles, K = tile_gauss.shape
    c = cfg.chunk
    px = cfg.tile * cfg.tile
    pix_x, pix_y = _tile_pixel_coords(cfg)
    n_chunks = (K + c - 1) // c
    ids_chunks = jnp.pad(tile_gauss, ((0, 0), (0, n_chunks * c - K)), constant_values=-1)
    ids_chunks = ids_chunks.reshape(T_tiles, n_chunks, c).transpose(1, 0, 2)

    def body(carry, xs):
        (t_cur, done, acc_c, acc_w, acc_d, acc_x, acc_n, med_t, med_x, med_pos) = carry
        ids, pos0 = xs
        mask = ids >= 0
        idc = jnp.where(mask, ids, 0)
        alpha, dx, dy, _, _ = _chunk_alpha(idc, mask, xy, conic, opacity, pix_x, pix_y)
        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=1)
        t_prefix = t_cur[:, None, :] * cum / one_minus  # exclusive prefix
        terminate = (alpha > 0.0) & (t_prefix * one_minus < T_EPS)
        kill = (jnp.cumsum(terminate, axis=1) > 0) | done[:, None, :]
        include = (alpha > 0.0) & ~kill
        w = jnp.where(include, alpha * t_prefix, 0.0)  # (T,c,px)

        rgb_t = _gather_t(rgb, idc)  # (3,T,c)
        n_t = _gather_t(normal, idc)  # (3,T,c)
        t_ray, coord, _, _, _ = _chunk_geometry(
            idc, dx, dy, view_point, camera_plane, ray_plane, ts
        )

        acc_c = acc_c + jnp.einsum("tcp,ktc->ktp", w, rgb_t)
        acc_n = acc_n + jnp.einsum("tcp,ktc->ktp", w, n_t)
        acc_w = acc_w + jnp.sum(w, axis=1)
        acc_d = acc_d + jnp.sum(w * t_ray, axis=1)
        acc_x = acc_x + jnp.sum(w[None] * coord, axis=2)

        med_mask = include & (t_prefix > 0.5)
        has_med = jnp.any(med_mask, axis=1)
        last = (alpha.shape[1] - 1) - jnp.argmax(jnp.flip(med_mask, axis=1), axis=1)
        med_t_new = jnp.take_along_axis(t_ray, last[:, None, :], axis=1)[:, 0, :]
        med_x_new = jnp.take_along_axis(coord, last[None, :, None, :], axis=2)[:, :, 0, :]
        med_t = jnp.where(has_med, med_t_new, med_t)
        med_x = jnp.where(has_med[None], med_x_new, med_x)
        med_pos = jnp.where(has_med, pos0 + last, med_pos)

        t_cur = t_cur * jnp.prod(jnp.where(include, one_minus, 1.0), axis=1)
        done = done | jnp.any(terminate, axis=1)
        return (t_cur, done, acc_c, acc_w, acc_d, acc_x, acc_n, med_t, med_x, med_pos), None

    f32 = jnp.float32
    init = (
        jnp.ones((T_tiles, px), f32),
        jnp.zeros((T_tiles, px), bool),
        jnp.zeros((3, T_tiles, px), f32),
        jnp.zeros((T_tiles, px), f32),
        jnp.zeros((T_tiles, px), f32),
        jnp.zeros((3, T_tiles, px), f32),
        jnp.zeros((3, T_tiles, px), f32),
        jnp.zeros((T_tiles, px), f32),
        jnp.zeros((3, T_tiles, px), f32),
        jnp.full((T_tiles, px), -1, jnp.int32),
    )
    pos0s = jnp.arange(n_chunks, dtype=jnp.int32) * c
    carry, _ = jax.lax.scan(body, init, (ids_chunks, pos0s))
    (t_cur, _, acc_c, acc_w, acc_d, acc_x, acc_n, med_t, med_x, med_pos) = carry
    return {
        "color_raw": acc_c,  # (3,T,px)
        "weight": acc_w,  # (T,px)
        "dist_raw": acc_d,
        "coord_raw": acc_x,  # (3,T,px)
        "normal_raw": acc_n,  # (3,T,px)
        "t_final": t_cur,
        "med_t": med_t,
        "med_coord": med_x,  # (3,T,px)
        "med_pos": med_pos,
    }


# ============================================================== backward ====


def _blend_backward_scan(cfg: RasterCfg, tile_gauss, inputs, fwd_out, cot):
    xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts = inputs
    P = xy.shape[0]
    T_tiles, K = tile_gauss.shape
    c = cfg.chunk
    px = cfg.tile * cfg.tile
    pix_x, pix_y = _tile_pixel_coords(cfg)
    n_chunks = (K + c - 1) // c
    ids_chunks = jnp.pad(tile_gauss, ((0, 0), (0, n_chunks * c - K)), constant_values=-1)
    ids_chunks = ids_chunks.reshape(T_tiles, n_chunks, c).transpose(1, 0, 2)

    g_c = cot["color_raw"]  # (3,T,px)
    g_w = cot["weight"]  # (T,px)
    g_d = cot["dist_raw"]
    g_x = cot["coord_raw"]  # (3,T,px)
    g_n = cot["normal_raw"]
    g_tf = cot["t_final"]
    g_mt = cot["med_t"]
    g_mx = cot["med_coord"]  # (3,T,px)

    tot_c = fwd_out["color_raw"]
    tot_w = fwd_out["weight"]
    tot_d = fwd_out["dist_raw"]
    tot_x = fwd_out["coord_raw"]
    tot_n = fwd_out["normal_raw"]
    t_fin = fwd_out["t_final"]
    med_pos = fwd_out["med_pos"]

    f32 = jnp.float32
    zeros = jnp.zeros
    grads0 = dict(
        xy=zeros((P, 2), f32),
        xy_abs=zeros((P, 2), f32),
        conic=zeros((P, 3), f32),
        opacity=zeros((P,), f32),
        rgb=zeros((P, 3), f32),
        view_point=zeros((P, 3), f32),
        camera_plane=zeros((P, 3, 2), f32),
        ray_plane=zeros((P, 2), f32),
        normal=zeros((P, 3), f32),
        ts=zeros((P,), f32),
    )

    def body(carry, xs):
        (t_cur, done, pre_c, pre_w, pre_d, pre_x, pre_n, grads) = carry
        ids, pos0 = xs
        mask = ids >= 0
        idc = jnp.where(mask, ids, 0)
        alpha, dx, dy, g_fall, raw_alpha = _chunk_alpha(
            idc, mask, xy, conic, opacity, pix_x, pix_y
        )
        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=1)
        t_prefix = t_cur[:, None, :] * cum / one_minus
        terminate = (alpha > 0.0) & (t_prefix * one_minus < T_EPS)
        kill = (jnp.cumsum(terminate, axis=1) > 0) | done[:, None, :]
        include = (alpha > 0.0) & ~kill
        w = jnp.where(include, alpha * t_prefix, 0.0)

        rgb_t = _gather_t(rgb, idc)  # (3,T,c)
        n_t = _gather_t(normal, idc)
        t_ray, coord, rp_g, cpx_t, cpy_t = _chunk_geometry(
            idc, dx, dy, view_point, camera_plane, ray_plane, ts
        )

        # inclusive prefixes of the blended sums (global: carried + in-chunk)
        pc = pre_c[:, :, None] + jnp.cumsum(w[None] * rgb_t[..., None], axis=2)  # (3,T,c,px)
        pw = pre_w[:, None] + jnp.cumsum(w, axis=1)  # (T,c,px)
        pd = pre_d[:, None] + jnp.cumsum(w * t_ray, axis=1)
        pxx = pre_x[:, :, None] + jnp.cumsum(w[None] * coord, axis=2)  # (3,T,c,px)
        pn = pre_n[:, :, None] + jnp.cumsum(w[None] * n_t[..., None], axis=2)

        # dL/dw_i — the direct path through this contributor's weight
        dL_dw = (
            jnp.einsum("ktp,ktc->tcp", g_c, rgb_t)
            + jnp.einsum("ktp,ktc->tcp", g_n, n_t)
            + g_w[:, None, :]
            + g_d[:, None, :] * t_ray
            + jnp.sum(g_x[:, :, None, :] * coord, axis=0)
        )

        # dL/dalpha_i: T_i * dL_dw  -  (suffix sums + T_final) / (1 - alpha_i)
        suffix = (
            jnp.einsum("ktp,ktcp->tcp", g_c, tot_c[:, :, None] - pc)
            + jnp.einsum("ktp,ktcp->tcp", g_n, tot_n[:, :, None] - pn)
            + g_w[:, None, :] * (tot_w[:, None] - pw)
            + g_d[:, None, :] * (tot_d[:, None] - pd)
            + jnp.sum(g_x[:, :, None, :] * (tot_x[:, :, None] - pxx), axis=0)
            + g_tf[:, None, :] * t_fin[:, None, :]
        )
        dL_dalpha = jnp.where(
            include, t_prefix * dL_dw - suffix / one_minus, 0.0
        )  # (T,c,px)

        # median routing (backward.cu:909-936)
        pos = pos0 + jnp.arange(alpha.shape[1], dtype=jnp.int32)
        is_med = include & (med_pos[:, None, :] == pos[None, :, None])
        dL_dt = w * g_d[:, None, :] + jnp.where(is_med, g_mt[:, None, :], 0.0)
        dL_dcoord = w[None] * g_x[:, :, None, :] + jnp.where(
            is_med[None], g_mx[:, :, None, :], 0.0
        )  # (3,T,c,px)

        # alpha -> (opacity, power) with the 0.99 clip gate (forward.cu:565)
        unclipped = (raw_alpha < MAX_ALPHA) & include
        dL_draw = jnp.where(unclipped, dL_dalpha, 0.0)
        op_g = _gather(opacity, idc)
        dL_dop = dL_draw * g_fall  # (T,c,px)
        dL_dG = dL_draw * op_g[..., None]

        con_g = _gather(conic, idc)
        gdx, gdy = g_fall * dx, g_fall * dy
        dG_ddelx = -gdx * con_g[..., 0, None] - gdy * con_g[..., 1, None]
        dG_ddely = -gdy * con_g[..., 2, None] - gdx * con_g[..., 1, None]

        # d = xy - pix: gradients w.r.t. the projected center
        dL_ddelx = (
            dL_dG * dG_ddelx
            + dL_dt * rp_g[..., 0, None]
            + jnp.sum(dL_dcoord * cpx_t[..., None], axis=0)
        )
        dL_ddely = (
            dL_dG * dG_ddely
            + dL_dt * rp_g[..., 1, None]
            + jnp.sum(dL_dcoord * cpy_t[..., None], axis=0)
        )
        # densification stats (backward.cu:1002-1006): falloff path only, NDC scale
        absg = jnp.abs(dL_dG * dG_ddelx) * (cfg.width * 0.5) + jnp.abs(
            dL_dG * dG_ddely
        ) * (cfg.height * 0.5)

        # reduce over pixels -> per (tile, contributor), then scatter by id
        def red(x):
            return jnp.sum(x, axis=-1)  # (...,T,c,px) -> (...,T,c)

        dcoord_red = jnp.moveaxis(red(dL_dcoord), 0, -1)  # (T,c,3)
        upd = dict(
            xy=jnp.stack([red(dL_ddelx), red(dL_ddely)], axis=-1),
            xy_abs=jnp.stack([red(absg), jnp.zeros_like(red(absg))], axis=-1),
            conic=jnp.stack(
                [
                    red(-0.5 * gdx * dx * dL_dG),
                    red(-gdx * dy * dL_dG),  # off-diagonal appears twice in power
                    red(-0.5 * gdy * dy * dL_dG),
                ],
                axis=-1,
            ),
            opacity=red(dL_dop),
            rgb=jnp.einsum("tcp,ktp->tck", w, g_c),
            view_point=dcoord_red,
            camera_plane=jnp.stack(
                [
                    jnp.moveaxis(red(dL_dcoord * dx[None]), 0, -1),
                    jnp.moveaxis(red(dL_dcoord * dy[None]), 0, -1),
                ],
                axis=-1,
            ),
            ray_plane=jnp.stack([red(dL_dt * dx), red(dL_dt * dy)], axis=-1),
            normal=jnp.einsum("tcp,ktp->tck", w, g_n),
            ts=red(dL_dt),
        )
        flat_ids = jnp.where(mask, idc, P).reshape(-1)
        for k in grads:
            u = upd[k].reshape((flat_ids.shape[0],) + upd[k].shape[2:])
            padded = jnp.concatenate([grads[k], jnp.zeros((1,) + grads[k].shape[1:], f32)])
            grads[k] = padded.at[flat_ids].add(u)[:-1]

        t_cur = t_cur * jnp.prod(jnp.where(include, one_minus, 1.0), axis=1)
        done = done | jnp.any(terminate, axis=1)
        return (
            (t_cur, done, pc[:, :, -1], pw[:, -1], pd[:, -1], pxx[:, :, -1], pn[:, :, -1], grads),
            None,
        )

    T0 = jnp.ones((T_tiles, px), f32)
    init = (
        T0,
        jnp.zeros_like(T0, dtype=bool),
        zeros((3, T_tiles, px), f32),
        zeros((T_tiles, px), f32),
        zeros((T_tiles, px), f32),
        zeros((3, T_tiles, px), f32),
        zeros((3, T_tiles, px), f32),
        grads0,
    )
    pos0s = jnp.arange(n_chunks, dtype=jnp.int32) * c
    carry, _ = jax.lax.scan(body, init, (ids_chunks, pos0s))
    return carry[-1]


# ====================================================== custom_vjp glue ====


# tiles per Pallas program (occupancy batching, ops/pallas_blend_mt.py):
# 1 = the single-tile kernels; >1 amortizes per-program fixed cost over G
# consecutive tiles (bit-identical outputs, parity-pinned). Default 2 by
# device A/B (round-5 session C, 100k bench): G=1 17.67M, G=2 17.95M,
# G=4 17.74M rays/s — the fixed-cost amortization peaks at 2 and the
# longer unrolled program starts costing at 4.
import os as _os

_TILE_BATCH = int(_os.environ.get("RADEGS_TILE_BATCH", "2"))


def _forward_dispatch(cfg: RasterCfg, binning, inputs):
    if cfg.backend in ("pallas", "pallas_interpret"):
        interp = cfg.backend == "pallas_interpret"
        if _TILE_BATCH > 1:
            from radegs_tpu.ops.pallas_blend_mt import blend_forward_pallas_mt

            return blend_forward_pallas_mt(
                binning, *inputs, width=cfg.width, height=cfg.height,
                tile=cfg.tile, gbatch=_TILE_BATCH, interpret=interp,
            )
        from radegs_tpu.ops.pallas_blend import blend_forward_pallas

        return blend_forward_pallas(
            binning, *inputs, width=cfg.width, height=cfg.height, tile=cfg.tile,
            interpret=interp,
        )
    return _blend_forward_scan(cfg, binning.tile_gauss, inputs)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend(cfg: RasterCfg, binning, xy, xy_abs, conic, opacity, rgb, view_point,
           camera_plane, ray_plane, normal, ts):
    del xy_abs
    return _forward_dispatch(
        cfg, binning, (xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts)
    )


def _blend_fwd(cfg, binning, xy, xy_abs, conic, opacity, rgb, view_point,
               camera_plane, ray_plane, normal, ts):
    inputs = (xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts)
    out = _forward_dispatch(cfg, binning, inputs)
    return out, (binning, inputs, out)


def _blend_bwd(cfg, res, cot):
    binning, inputs, fwd_out = res
    cot = dict(cot)
    # non-differentiable outputs
    cot["med_pos"] = None
    if cfg.backend in ("pallas", "pallas_interpret"):
        if _TILE_BATCH > 1:
            from radegs_tpu.ops.pallas_blend_mt import blend_backward_pallas_mt

            grads = blend_backward_pallas_mt(
                binning, inputs, fwd_out, cot,
                width=cfg.width, height=cfg.height, tile=cfg.tile,
                gbatch=_TILE_BATCH,
                interpret=(cfg.backend == "pallas_interpret"),
            )
        else:
            from radegs_tpu.ops.pallas_blend import blend_backward_pallas

            grads = blend_backward_pallas(
                binning, inputs, fwd_out, cot,
                width=cfg.width, height=cfg.height, tile=cfg.tile,
                interpret=(cfg.backend == "pallas_interpret"),
            )
    else:
        grads = _blend_backward_scan(cfg, binning.tile_gauss, inputs, fwd_out, cot)
    return (
        None,  # binning
        grads["xy"],
        grads["xy_abs"],
        grads["conic"],
        grads["opacity"],
        grads["rgb"],
        grads["view_point"],
        grads["camera_plane"],
        grads["ray_plane"],
        grads["normal"],
        grads["ts"],
    )


_blend.defvjp(_blend_fwd, _blend_bwd)


# ============================================================ public API ====


def rasterize(
    prep: PreprocessOut,
    camera,
    bg,
    binning: TileBinning | None = None,
    max_per_tile: int = 512,
    instance_budget: int | None = None,
    tile: int = 16,
    chunk: int = 8,
    xy_abs=None,
    backend: str | None = None,
    render_width: int | None = None,
    render_height: int | None = None,
    band_row0: int = 0,
):
    """Full rasterization: binning + blending + output normalization.

    Returns the render() dict of gaussian_renderer/__init__.py:85-95 (with
    jnp images, channels-first) plus binning diagnostics.

    ``xy_abs``: optional (P,2) zeros; pass it and take gradients w.r.t. it to
    obtain the GOF absolute screen-gradient densification statistic.

    ``backend``: "xla" | "pallas" | "pallas_interpret"; None = auto
    ("pallas" on TPU, "xla" elsewhere).

    ``render_width/render_height/band_row0``: render only a horizontal BAND
    of the image (parallel/step.py tile-band sharding). prep.xy must already
    be shifted into band-local pixels (y - band_row0); the camera keeps the
    FULL image geometry (focal lengths, principal point), and the
    distance->depth divisor ln uses global pixel rows (band_row0 + local).
    """
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = RasterCfg(
        width=render_width or camera.width,
        height=render_height or camera.height,
        tile=tile, chunk=chunk, backend=backend,
    )
    if binning is None:
        if instance_budget is None:
            instance_budget = default_instance_budget(prep.xy.shape[0])
        import os as _os

        if backend == "xla" or _os.environ.get("RADEGS_FEAT_RIDE", "0") == "0":
            features = None  # the scan path reads per-gaussian arrays.
            # RADEGS_FEAT_RIDE=1 opts into the pack-rides-sort design —
            # parity-proven but its device compile+runtime is still
            # unmeasured (the grouped-sort compile of the first attempt
            # never finished inside a wedge window), so the default stays
            # the legacy post-sort gather until a bench lands
        else:
            # pallas: the blend-feature columns ride the binning's slot
            # expansion + tile sort, replacing the post-sort random-id
            # gather of sorted_features (~320 ms at dense scale). Values
            # are identical; gradients come from the custom VJP, so the
            # stop_gradient is free.
            from radegs_tpu.ops.pallas_blend import feature_rows

            features = jax.lax.stop_gradient(feature_rows((
                prep.xy, prep.conic,
                jnp.where(prep.valid, prep.opacity, 0.0), prep.rgb,
                prep.view_point, prep.camera_plane, prep.ray_plane,
                prep.normal, prep.ts)))
        binning = bin_gaussians(
            jax.lax.stop_gradient(prep.xy),
            jax.lax.stop_gradient(prep.radius),
            jax.lax.stop_gradient(prep.depth),
            prep.valid,
            cfg.width,
            cfg.height,
            instance_budget=instance_budget,
            max_per_tile=max_per_tile,
            tile=tile,
            conic=jax.lax.stop_gradient(prep.conic),
            opacity=jax.lax.stop_gradient(
                jnp.where(prep.valid, prep.opacity, 0.0)
            ),
            need_tile_gauss=(backend == "xla"),
            features=features,
        )
    if xy_abs is None:
        xy_abs = jnp.zeros_like(prep.xy)

    raw = _blend(
        cfg,
        binning,
        prep.xy,
        xy_abs,
        prep.conic,
        jnp.where(prep.valid, prep.opacity, 0.0),
        prep.rgb,
        prep.view_point,
        prep.camera_plane,
        prep.ray_plane,
        prep.normal,
        prep.ts,
    )

    # ---- output normalization (plain jnp: autodiff replaces backward.cu:737-779)
    pix_x, pix_y = _tile_pixel_coords(cfg)
    fx, fy = camera.focal_x, camera.focal_y
    # ln uses GLOBAL image geometry (W/2-centered, forward.cu:466) even when
    # rendering a band (band_row0 > 0)
    pnx = (pix_x - camera.width / 2.0) / fx
    pny = (pix_y + band_row0 - camera.height / 2.0) / fy
    ln = jnp.sqrt(pnx * pnx + pny * pny + 1.0)  # (T,px)

    weight = raw["weight"]
    any_contrib = weight > 0.0
    # double-where guards: empty pixels must yield zero — not NaN — cotangents
    w_safe = jnp.where(any_contrib, weight, 1.0)
    inv_w = jnp.where(any_contrib, 1.0 / w_safe, 0.0)

    color = raw["color_raw"] + raw["t_final"][None] * bg[:, None, None]  # (3,T,px)
    accum_depth = raw["dist_raw"] / ln
    out_depth = accum_depth * inv_w
    out_mdepth = raw["med_t"] / ln
    out_coord = raw["coord_raw"] * inv_w[None]
    n2 = jnp.sum(jnp.square(raw["normal_raw"]), axis=0)
    n_len = jnp.sqrt(jnp.where(any_contrib, n2, 1.0))
    out_normal = jnp.where(
        any_contrib[None],
        raw["normal_raw"] / jnp.maximum(n_len, NORMALIZE_EPS)[None],
        0.0,
    )

    out = {
        "render": _untile(color, cfg),
        "mask": _untile(weight[None], cfg),
        "expected_depth": _untile(out_depth[None], cfg),
        "median_depth": _untile(out_mdepth[None], cfg),
        "expected_coord": _untile(out_coord, cfg),
        "median_coord": _untile(raw["med_coord"], cfg),
        "normal": _untile(out_normal, cfg),
        "radii": prep.radius,
        "visibility_filter": prep.valid & (prep.radius > 0),
        "binning": binning,
    }
    return out

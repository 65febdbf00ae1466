"""Point-opacity integration for Marching-Tetrahedra mesh extraction.

TPU re-design of ``integrateCUDA`` (forward.cu:938-1372) and
``preprocessPointsCUDA`` (forward.cu:856-931):

- Phase A renders a 9-channel image per the reference's layout
  [0:3 color, 3 expected-depth-sum, 4 median depth, 5 unused, 6 max depth,
  7 alpha, 8 #projected points] while tracking, per pixel, five sub-pixel
  transmittances (center + 4 corners at +-0.5 px, forward.cu:1019-1021) and
  the median plane (mid_depth/mid_plane/mid_xy) used for the point SDF.
- Phase B walks, for every query point, its pixel's depth-sorted Gaussian
  list, recomputing the corner-transmittance "used" gate exactly as phase A
  (the reference instead records contributor ids with a 2048 cap,
  forward.cu:1124-1133 — re-walking is cap-free and TPU-shaped), and
  accumulates the ray-space 3D opacity
      alpha = min(0.99, o * exp(-1/2 d^T invraycov d)),
      d = (dx_pix, dy_pix, t_center - min(t_point, t_at_point))
  front-to-back into per-point transmittance (forward.cu:1300-1339).

No gradients flow through integration (the reference's path is no-grad too).
All loops are lax.scans with static chunk sizes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from radegs_tpu.core.projection import NEAR_PLANE, PreprocessOut
from radegs_tpu.ops.binning import TileBinning, bin_gaussians, tile_grid

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99
# sub-pixel offsets: center + 4 corners (forward.cu:1020-1021)
OFFS_X = (0.0, -0.5, 0.5, -0.5, 0.5)
OFFS_Y = (0.0, -0.5, -0.5, 0.5, 0.5)


class PointProjection(NamedTuple):
    valid: Any  # (N,) inside frustum and image
    xy: Any  # (N,2) pixel coords
    depth: Any  # (N,) ray distance |p_view|
    pixel: Any  # (N,2) int pixel indices
    tile: Any  # (N,) tile id


def project_points(points3d, camera):
    """preprocessPointsCUDA (forward.cu:856-931)."""
    viewmat = camera.world_view
    p_view = points3d @ viewmat[:3, :3].T + viewmat[:3, 3]
    z = jnp.where(p_view[:, 2] > 0, p_view[:, 2], 1e-7)
    fx, fy = camera.focal_x, camera.focal_y
    W, H = camera.width, camera.height
    px = fx * p_view[:, 0] / (z + 1e-7) + W / 2.0
    py = fy * p_view[:, 1] / (z + 1e-7) + H / 2.0
    inside = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    valid = (p_view[:, 2] > NEAR_PLANE) & inside
    depth = jnp.linalg.norm(p_view, axis=-1)
    pi = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 1)
    pj = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 1)
    tiles_x, _ = tile_grid(W, H)
    tile = (pj // 16) * tiles_x + (pi // 16)
    return PointProjection(valid, jnp.stack([px, py], -1), depth,
                           jnp.stack([pi, pj], -1), tile)


def _corner_step(Ts, alpha, passes):
    """One contributor's corner-transmittance update (forward.cu:1063-1086):
    skip (don't update) when the test transmittance would underflow."""
    test = Ts * (1.0 - alpha)
    ok = passes & (test >= T_EPS)
    return jnp.where(ok, test, Ts), ok


def _alphas_at(xy_g, con_g, op_g, px, py):
    """alpha + pass flag of one contributor at given positions.

    xy_g: (...,2) center; con_g: (...,3); op_g: (...,); px/py broadcastable.
    """
    dx = xy_g[..., 0] - px
    dy = xy_g[..., 1] - py
    power = (
        -0.5 * (con_g[..., 0] * dx * dx + con_g[..., 2] * dy * dy)
        - con_g[..., 1] * dx * dy
    )
    alpha = jnp.minimum(MAX_ALPHA, op_g * jnp.exp(jnp.minimum(power, 0.0)))
    passes = (power <= 0.0) & (alpha >= ALPHA_EPS)
    return alpha, passes, dx, dy


@partial(jax.jit, static_argnames=("width", "height", "chunk"))
def integrate_image(prep: PreprocessOut, binning: TileBinning, bg, n_projected,
                    *, width: int, height: int, chunk: int = 8):
    """Phase A: the 9-channel integrate image + per-pixel median plane."""
    tiles_x, tiles_y = tile_grid(width, height)
    T_tiles = tiles_x * tiles_y
    px_n = 256
    tile_gauss = binning.tile_gauss
    K = tile_gauss.shape[1]
    n_chunks = (K + chunk - 1) // chunk
    ids_chunks = jnp.pad(tile_gauss, ((0, 0), (0, n_chunks * chunk - K)),
                         constant_values=-1).reshape(T_tiles, n_chunks, chunk).transpose(1, 0, 2)

    t = jnp.arange(T_tiles)
    i = jnp.arange(px_n)
    pixf_x = ((t % tiles_x)[:, None] * 16 + i[None, :] % 16).astype(jnp.float32) + 0.5
    pixf_y = ((t // tiles_x)[:, None] * 16 + i[None, :] // 16).astype(jnp.float32) + 0.5

    f32 = jnp.float32
    zeros = lambda: jnp.zeros((T_tiles, px_n), f32)
    init = dict(
        Ts=jnp.ones((5, T_tiles, px_n), f32),
        c0=zeros(), c1=zeros(), c2=zeros(),
        exp_d=zeros(), med_d=zeros(), max_d=zeros(), alpha=zeros(),
        mid_dc=zeros(), mid_p0=zeros(), mid_p1=zeros(),
        mid_x=zeros(), mid_y=zeros(),
    )

    opac = jnp.where(prep.valid, prep.opacity, 0.0)

    def body(acc, ids):
        mask = ids >= 0
        idc = jnp.where(mask, ids, 0)
        xy_g = jnp.take(prep.xy, idc, axis=0)  # (T,c,2)
        con_g = jnp.take(prep.conic, idc, axis=0)
        op_g = jnp.where(mask, jnp.take(opac, idc, axis=0), 0.0)
        rgb_g = jnp.take(prep.rgb, idc, axis=0)
        dc_g = jnp.take(prep.ts, idc, axis=0)
        rp_g = jnp.take(prep.ray_plane, idc, axis=0)

        offx = jnp.asarray(OFFS_X)[:, None, None]  # (5,1,1)
        offy = jnp.asarray(OFFS_Y)[:, None, None]
        # sequential in-chunk walk over Gaussians (the per-sample skip gate is
        # not a cumprod); the 5 sub-pixel corners are independent -> stacked
        for j in range(ids.shape[1]):
            xy_j = xy_g[:, j][:, None, :]  # (T,1,2)
            con_j = con_g[:, j][:, None, :]
            op_j = op_g[:, j][:, None]
            alpha, passes, dx, dy = _alphas_at(
                xy_j[None], con_j[None], op_j[None],
                pixf_x[None] + offx, pixf_y[None] + offy,
            )  # all (5,T,px)
            Ts = acc["Ts"]
            new_Ts, ok = _corner_step(Ts, alpha, passes)
            depth = (
                dc_g[:, j][None, :, None]
                + rp_g[:, j, 0][None, :, None] * dx
                + rp_g[:, j, 1][None, :, None] * dy
            )
            acc["max_d"] = jnp.maximum(acc["max_d"], jnp.max(
                jnp.where(ok, depth, -jnp.inf), axis=0))
            ok0, Tk0, a0, d0 = ok[0], Ts[0], alpha[0], depth[0]
            w = jnp.where(ok0, a0 * Tk0, 0.0)
            acc["c0"] += w * rgb_g[:, j, 0][:, None]
            acc["c1"] += w * rgb_g[:, j, 1][:, None]
            acc["c2"] += w * rgb_g[:, j, 2][:, None]
            acc["alpha"] += w
            acc["exp_d"] += w * d0
            is_med = ok0 & (Tk0 > 0.5)
            acc["med_d"] = jnp.where(is_med, d0, acc["med_d"])
            acc["mid_dc"] = jnp.where(is_med, dc_g[:, j][:, None], acc["mid_dc"])
            acc["mid_p0"] = jnp.where(is_med, rp_g[:, j, 0][:, None], acc["mid_p0"])
            acc["mid_p1"] = jnp.where(is_med, rp_g[:, j, 1][:, None], acc["mid_p1"])
            acc["mid_x"] = jnp.where(is_med, xy_j[..., 0], acc["mid_x"])
            acc["mid_y"] = jnp.where(is_med, xy_j[..., 1], acc["mid_y"])
            acc["Ts"] = new_Ts
        return acc, None

    acc, _ = jax.lax.scan(body, init, ids_chunks)

    def untile(x):
        img = x.reshape(tiles_y, tiles_x, 16, 16)
        img = img.transpose(0, 2, 1, 3).reshape(tiles_y * 16, tiles_x * 16)
        return img[:height, :width]

    T0 = acc["Ts"][0]
    color = [untile(acc[f"c{k}"] + T0 * bg[k]) for k in range(3)]
    out_color = jnp.stack(
        color
        + [
            untile(acc["exp_d"]),
            untile(acc["med_d"]),
            jnp.zeros((height, width), f32),
            untile(acc["max_d"]),
            untile(acc["alpha"]),
            n_projected.astype(f32),
        ],
        axis=0,
    )
    mid = {k: acc[k] for k in ("mid_dc", "mid_p0", "mid_p1", "mid_x", "mid_y")}
    return out_color, mid


@partial(jax.jit, static_argnames=("chunk", "point_chunk"))
def integrate_points(prep: PreprocessOut, binning: TileBinning, pts: PointProjection,
                     mid, tiles_x: int, *, chunk: int = 8, point_chunk: int = 256):
    """Phase B: per-point alpha integration + SDF (forward.cu:1150-1372).

    Processes points in chunks; each point walks its own tile's Gaussian
    list. Returns (alpha_integrated (N,), point_sdf (N,)).
    """
    N = pts.xy.shape[0]
    n_pc = (N + point_chunk - 1) // point_chunk
    Npad = n_pc * point_chunk

    def padv(x, fill=0):
        pad = [(0, Npad - N)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    p_xy = padv(pts.xy).reshape(n_pc, point_chunk, 2)
    p_depth = padv(pts.depth).reshape(n_pc, point_chunk)
    p_tile = padv(pts.tile).reshape(n_pc, point_chunk)
    p_valid = padv(pts.valid).reshape(n_pc, point_chunk)
    p_pix = padv(pts.pixel).reshape(n_pc, point_chunk, 2)

    K = binning.tile_gauss.shape[1]
    n_chunks = (K + chunk - 1) // chunk
    tg_pad = jnp.pad(binning.tile_gauss, ((0, 0), (0, n_chunks * chunk - K)),
                     constant_values=-1)
    opac = jnp.where(prep.valid, prep.opacity, 0.0)

    # per-pixel median plane gathered to points (tile, pixel-in-tile index)
    def mid_at(mid_field, tile, pix):
        within = (pix[:, 1] % 16) * 16 + (pix[:, 0] % 16)
        return mid_field[tile, within]

    def one_chunk(xy, depth, tile, valid, pix):
        pc = xy.shape[0]
        ids_all = tg_pad[tile]  # (pc, n_chunks*chunk)
        pixf = pix.astype(jnp.float32) + 0.5

        def body(carry, ci):
            Ts, T_pt, a_int = carry
            ids = jax.lax.dynamic_slice(ids_all, (0, ci * chunk), (pc, chunk))
            mask = ids >= 0
            idc = jnp.where(mask, ids, 0)
            xy_g = jnp.take(prep.xy, idc, axis=0)  # (pc,c,2)
            con_g = jnp.take(prep.conic, idc, axis=0)
            op_g = jnp.where(mask, jnp.take(opac, idc, axis=0), 0.0)
            dc_g = jnp.take(prep.ts, idc, axis=0)
            rp_g = jnp.take(prep.ray_plane, idc, axis=0)
            irc_g = jnp.take(prep.invraycov, idc, axis=0)  # (pc,c,3,3)
            cond_g = jnp.take(prep.well_conditioned, idc, axis=0)

            offx = jnp.asarray(OFFS_X)[:, None]
            offy = jnp.asarray(OFFS_Y)[:, None]
            for j in range(chunk):
                alpha5, passes5, _, _ = _alphas_at(
                    xy_g[None, :, j], con_g[None, :, j], op_g[None, :, j],
                    pixf[None, :, 0] + offx, pixf[None, :, 1] + offy,
                )  # (5, pc)
                Ts, ok5 = _corner_step(Ts, alpha5, passes5)
                used = jnp.any(ok5, axis=0)
                # ray-space 3D opacity at the point (forward.cu:1300-1330)
                dx = xy_g[:, j, 0] - xy[:, 0]
                dy = xy_g[:, j, 1] - xy[:, 1]
                t_at = dc_g[:, j] + rp_g[:, j, 0] * dx + rp_g[:, j, 1] * dy
                dz_cond = dc_g[:, j] - jnp.minimum(depth, t_at)
                dz_flat = dc_g[:, j]  # reference ill-conditioned quirk
                dz = jnp.where(cond_g[:, j], dz_cond, dz_flat)
                d3 = jnp.stack([dx, dy, dz], -1)
                power = -0.5 * jnp.einsum("pi,pij,pj->p", d3, irc_g[:, j], d3)
                alpha_pt = jnp.minimum(MAX_ALPHA, op_g[:, j] * jnp.exp(jnp.minimum(power, 0.0)))
                alpha_pt = jnp.where(
                    cond_g[:, j] | (depth >= t_at), alpha_pt, 0.0
                )
                inc = used & (alpha_pt >= ALPHA_EPS)
                a_int = a_int + jnp.where(inc, alpha_pt * T_pt, 0.0)
                T_pt = jnp.where(inc, T_pt * (1.0 - alpha_pt), T_pt)
            return (Ts, T_pt, a_int), None

        init = (jnp.ones((5, pc)), jnp.ones((pc,)), jnp.zeros((pc,)))
        (Ts, T_pt, a_int), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))

        # SDF from the pixel's median plane (forward.cu:1356-1363)
        mdc = mid_at(mid["mid_dc"], tile, pix)
        mp0 = mid_at(mid["mid_p0"], tile, pix)
        mp1 = mid_at(mid["mid_p1"], tile, pix)
        mx = mid_at(mid["mid_x"], tile, pix)
        my = mid_at(mid["mid_y"], tile, pix)
        med_depth = mdc + mp0 * (mx - xy[:, 0]) + mp1 * (my - xy[:, 1])
        sdf = jnp.where((depth > 0) & valid, med_depth - depth, 0.0)
        a_int = jnp.where(valid, a_int, 1.0)
        return a_int, sdf

    a_int, sdf = jax.lax.map(
        lambda args: one_chunk(*args), (p_xy, p_depth, p_tile, p_valid, p_pix)
    )
    return a_int.reshape(Npad)[:N], sdf.reshape(Npad)[:N]


def point_sdf_from_mid(pts: PointProjection, mid, tiles_x: int):
    """Per-point SDF from the pixel's median plane (forward.cu:1356-1363)."""
    within = (pts.pixel[:, 1] % 16) * 16 + (pts.pixel[:, 0] % 16)

    def at(f):
        return f[pts.tile, within]

    med_depth = (
        at(mid["mid_dc"])
        + at(mid["mid_p0"]) * (at(mid["mid_x"]) - pts.xy[:, 0])
        + at(mid["mid_p1"]) * (at(mid["mid_y"]) - pts.xy[:, 1])
    )
    return jnp.where((pts.depth > 0) & pts.valid, med_depth - pts.depth, 0.0)


def integrate_view_cache(prep: PreprocessOut, camera, bg,
                         max_per_tile: int = 1024,
                         instance_budget: int | None = None, chunk: int = 8,
                         backend: str | None = None):
    """The POINTS-INDEPENDENT part of integrate: binning + the phase-A
    image + the per-pixel median plane. Marching-Tetrahedra re-evaluates
    the SDF at new points 1 + n_binary_steps times per view
    (mesh_extract_tetrahedra.py:90-102) — this cache makes those re-walks
    pay only phase B.

    ``backend`` picks the phase-A implementation ("xla" | "pallas" |
    "pallas_interpret"; None = auto, "pallas" on TPU). The Pallas path
    streams the depth-sorted instance list directly, so the rectangular
    (T, K) tile_gauss layout is skipped entirely."""
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    W, H = camera.width, camera.height
    if instance_budget is None:
        from radegs_tpu.ops.binning import default_instance_budget

        instance_budget = default_instance_budget(prep.xy.shape[0])
    binning = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, W, H,
                            instance_budget=instance_budget,
                            max_per_tile=max_per_tile,
                            need_tile_gauss=(backend == "xla"))
    # channel 8 (projected-point counts) is filled per point set later
    if backend in ("pallas", "pallas_interpret"):
        from radegs_tpu.ops.pallas_integrate import integrate_image_pallas

        out_color, mid = integrate_image_pallas(
            prep, binning, bg, jnp.zeros((H, W), jnp.int32), width=W, height=H,
            interpret=(backend == "pallas_interpret"),
        )
    else:
        out_color, mid = integrate_image(
            prep, binning, bg, jnp.zeros((H, W), jnp.int32), width=W, height=H,
            chunk=chunk,
        )
    return {"binning": binning, "color": out_color, "mid": mid}


def integrate_points_cached(points3d, prep: PreprocessOut, cache, camera,
                            chunk: int = 8, point_chunk: int = 256,
                            backend: str | None = None):
    """Phase B against a prepared view cache (integrate_view_cache)."""
    assert prep.invraycov is not None, "preprocess with compute_invraycov=True"
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    W, H = camera.width, camera.height
    binning, mid = cache["binning"], cache["mid"]
    pts = project_points(jnp.asarray(points3d, jnp.float32), camera)

    # per-pixel projected-point counts (channel 8)
    pix_flat = pts.pixel[:, 1] * W + pts.pixel[:, 0]
    counts = jnp.zeros((H * W,), jnp.int32).at[
        jnp.where(pts.valid, pix_flat, 0)
    ].add(pts.valid.astype(jnp.int32)).reshape(H, W)
    out_color = cache["color"].at[8].set(counts.astype(jnp.float32))

    tiles_x, _ = tile_grid(W, H)
    if backend in ("pallas", "pallas_interpret"):
        from radegs_tpu.ops.pallas_integrate import integrate_points_pallas

        a_int = integrate_points_pallas(
            prep, binning, pts, width=W, height=H,
            interpret=(backend == "pallas_interpret"),
        )
        sdf = point_sdf_from_mid(pts, mid, tiles_x)
    else:
        assert binning.tile_gauss is not None, (
            "cache built for the pallas backend (no tile_gauss); use the "
            "same backend for integrate_view_cache and integrate_points_cached"
        )
        a_int, sdf = integrate_points(prep, binning, pts, mid, tiles_x, chunk=chunk,
                                      point_chunk=point_chunk)
    return out_color, pts, a_int, sdf, binning


def integrate(points3d, prep: PreprocessOut, camera, bg,
              max_per_tile: int = 1024, instance_budget: int | None = None,
              chunk: int = 8, point_chunk: int = 256, backend: str | None = None):
    """Full integrate (gaussian_renderer/__init__.py:98-195 contract).

    Returns dict with render (9,H,W), alpha_integrated (N,),
    color_integrated (N,3), point_coordinate (N,2), point_sdf (N,), plus
    visibility info.

    ``backend``: "xla" | "pallas" | "pallas_interpret" for the point phase;
    None = auto ("pallas" on TPU).
    """
    W, H = camera.width, camera.height
    cache = integrate_view_cache(prep, camera, bg, max_per_tile=max_per_tile,
                                 instance_budget=instance_budget, chunk=chunk,
                                 backend=backend)
    out_color, pts, a_int, sdf, binning = integrate_points_cached(
        points3d, prep, cache, camera, chunk=chunk, point_chunk=point_chunk,
        backend=backend,
    )
    # color_integrated: the point's pixel's final blended color C + T*bg
    # (forward.cu:1354 — a pixel-color sample, not a per-point blend);
    # one (HW,3) row gather instead of per-element fancy indexing
    col_flat = out_color[0:3].reshape(3, H * W).T  # (HW, 3)
    pix_idx = jnp.where(pts.valid, pts.pixel[:, 1] * W + pts.pixel[:, 0], 0)
    color_integrated = jnp.where(pts.valid[:, None], col_flat[pix_idx], 0.0)

    return {
        "render": out_color,
        "alpha_integrated": a_int,
        "color_integrated": color_integrated,
        "point_coordinate": pts.xy,
        "point_sdf": sdf,
        "point_valid": pts.valid,
        "binning": binning,
    }

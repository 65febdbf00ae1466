"""Explicit multi-chip train step: visibility-compressed gather +
tile-band sharding (SURVEY.md §5.7 / §2.4 "Collectives" design).

The GSPMD path (parallel/sharding.py) lets XLA insert FULL per-Gaussian
all-gathers at the binning boundary — at Mip-360 scale that moves ~60x more
bytes than the visible set. This module builds the communication pattern by
hand inside one `shard_map` over a 1-D device axis ``d``:

1. Gaussians are sharded over ``d`` (the capacity axis). Preprocess
   (projection / covariance / SH / planes) runs shard-local — zero comm.
2. Each shard COMPACTS its frustum-visible gaussians into ``vis_capacity``
   slots (static shape; overflow counted, never silent) and all-gathers
   only those 27 attribute columns — the visibility-compressed gather.
3. Image tiles are sharded as horizontal BANDS over the same axis: each
   device bins + rasterizes only its rows (ops.rasterize band mode), so
   blend work scales 1/n with no duplicated rasterization.
4. Losses are computed band-local with ppermute HALO exchanges (5 rows for
   the 11x11 SSIM window, 1 row for the depth->normal stencil), then scalar
   psums — the full-resolution loss is bit-matched to the single-device
   computation without ever materializing a full image anywhere.
5. The backward runs through the same collectives (all_gather adjoint =
   psum-scatter of gradients to the owning shard; ppermute adjoint = the
   reverse permutation), so each shard receives exactly its own gaussians'
   gradients. Adam is shard-local — the particle axis is model-parallel,
   there is no gradient all-reduce at all.

The reference has no distributed runtime to mirror (single GPU,
utils/general_utils.py:135); this layer is the TPU-native scale-out that
BASELINE.md's >=0.8 weak-scaling target asks for.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.ops.binning import default_instance_budget
from radegs_tpu.ops.rasterize import rasterize
from radegs_tpu.models.appearance import AppearanceNetwork, appearance_transform
from radegs_tpu.ops.ssim import l1_loss, ssim_map
from radegs_tpu.train.optim import BETA1, BETA2, EPS, GroupLRs, adam_step, expon_lr

AXIS = "d"


def make_mesh_1d(devices=None) -> Mesh:
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def band_layout(height: int, n: int, tile: int = 16):
    """(band_tile_rows, band_px_rows, padded_height)."""
    tiles_y = (height + tile - 1) // tile
    band_tiles = (tiles_y + n - 1) // n
    band_px = band_tiles * tile
    return band_tiles, band_px, band_px * n


def pad_gt(gt, height_pad: int):
    """Zero-pad a (3,H,W) ground-truth image to the band-divisible height."""
    H = gt.shape[1]
    if H == height_pad:
        return gt
    return jnp.pad(gt, ((0, 0), (0, height_pad - H), (0, 0)))


def _halo(x, h: int, d, n):
    """Exchange ``h`` boundary rows with band neighbors along axis -2.

    Returns (top_halo, bottom_halo), zeros at the global image edges —
    matching the zero 'same' padding of the single-device loss filters."""
    fwd = [(i, (i + 1) % n) for i in range(n)]  # my bottom rows -> next dev
    bwd = [(i, (i - 1) % n) for i in range(n)]  # my top rows -> prev dev
    top_halo = jax.lax.ppermute(x[..., -h:, :], AXIS, fwd)  # from prev dev
    bot_halo = jax.lax.ppermute(x[..., :h, :], AXIS, bwd)  # from next dev
    top_halo = jnp.where(d == 0, 0.0, top_halo)
    bot_halo = jnp.where(d == n - 1, 0.0, bot_halo)
    return top_halo, bot_halo


def _with_halo(x, h: int, d, n):
    top, bot = _halo(x, h, d, n)
    return jnp.concatenate([top, x, bot], axis=-2)


def _band_depths_to_points(camera, depthmap, y0):
    """Band version of core.geometry.depths_to_points: rays through global
    pixel rows y0 + [0, R)."""
    R = depthmap.shape[-2]
    W = camera.width
    H = camera.height
    fx = W / (2.0 * jnp.tan(camera.fovx / 2.0))
    fy = H / (2.0 * jnp.tan(camera.fovy / 2.0))
    gx = (jnp.arange(W, dtype=jnp.float32) + 0.5 - W / 2.0) / fx
    gy = (y0 + jnp.arange(R, dtype=jnp.float32) + 0.5 - H / 2.0) / fy
    rays = jnp.stack(
        [
            jnp.broadcast_to(gx[None, :], (R, W)),
            jnp.broadcast_to(gy[:, None], (R, W)),
            jnp.ones((R, W), jnp.float32),
        ],
        axis=0,
    )
    return depthmap.reshape(1, R, W) * rays


def _points_to_normal_nopad(points):
    """points (..., 3, R, W) -> normals for rows 1..R-2 (cropped interior),
    zero columns at the image left/right borders (core.geometry semantics)."""
    d_row = points[..., :, 2:, 1:-1] - points[..., :, :-2, 1:-1]
    d_col = points[..., :, 1:-1, 2:] - points[..., :, 1:-1, :-2]
    n = jnp.cross(d_row, d_col, axisa=-3, axisb=-3, axisc=-3)
    n2 = jnp.sum(jnp.square(n), axis=-3, keepdims=True)
    ok = n2 > 1e-24
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    n = n * inv
    pad = [(0, 0)] * (points.ndim - 2) + [(0, 0), (1, 1)]
    return jnp.pad(n, pad)  # columns padded; rows stay cropped


def _state_specs(ts):
    """PartitionSpec tree for a TrainState: (C, ...) gaussian leaves over
    ``d``, everything else replicated."""
    C = ts.gaussians.capacity

    def leaf_spec(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == C:
            return P(AXIS)
        return P()

    g_spec = jax.tree.map(leaf_spec, ts.gaussians)
    rest = jax.tree.map(lambda _: P(), ts.replace(gaussians=None))
    return rest.replace(gaussians=g_spec)


def make_sharded_train_step(
    mcfg,
    ocfg,
    pcfg,
    spatial_lr_scale: float,
    mesh: Mesh,
    width: int,
    height: int,
    vis_capacity: int | None = None,
    backend: str | None = None,
):
    """Build the jitted visibility-compressed sharded train step.

    vis_capacity: static per-shard cap on compacted visible gaussians
    (None = capacity/n, i.e. lossless). Overflow is reported in metrics as
    ``n_vis_overflow`` — never silent.

    Returns step(ts, camera, gt_padded, bg) -> (ts, metrics); ``gt_padded``
    must be pad_gt(gt, band_layout(...)[2]) and ts placed with
    sharding.shard-like placement (or any placement — jit reshards).
    """
    n = mesh.shape[AXIS]
    band_tiles, band_px, height_pad = band_layout(height, n)
    lam = ocfg.lambda_dssim

    def device_step(ts, camera, gt_band, bg, view_idx):
        d = jax.lax.axis_index(AXIS)
        g = ts.gaussians
        Cn = g.capacity  # per-shard block
        V = min(vis_capacity, Cn) if vis_capacity else Cn
        it = ts.iteration + 1
        zeros2 = jnp.zeros((Cn, 2), jnp.float32)
        y0_tile_rows = d * band_tiles
        y0 = (y0_tile_rows * 16).astype(jnp.float32)
        # per-band instance budget (static): the band holds ~1/n of the
        # image's tiles, so 1/n of the usual budget; an explicit
        # pcfg.instance_budget (the loop's autotune pins one to the measured
        # peak) rides the same 1/n split
        budget = max(
            min((pcfg.instance_budget
                 or default_instance_budget(V * n, pcfg.instance_multiplier))
                // n,
                (1 << 24) // n),
            1 << 12,
        )

        def loss_fn(params, app_params, xy_offset, xy_abs):
            gg = g.replace(params=params)
            scales, opacity = gg.get_fused_scaling_opacity()
            opacity = jnp.where(gg.active[:, None], opacity, 0.0)
            prep = preprocess_gaussians(
                gg.params.xyz, scales, gg.get_rotation(), opacity,
                gg.get_features(), sh_degree=gg.max_sh_degree, camera=camera,
                kernel_size=mcfg.kernel_size,
                active_sh_degree=gg.active_sh_degree,
            )
            prep = prep.replace(
                valid=prep.valid & gg.active, xy=prep.xy + xy_offset
            )

            # ---- visibility compaction (the compression step) ----
            # prep.valid is only the reference's z > near test
            # (forward.cu in_frustum); a gaussian in front of the camera but
            # entirely OFF-SCREEN still has radius > 0 and would ride the
            # all-gather for nothing (binning drops it via touched == 0).
            # Screen-bounds test against the FULL image (every band's tiles
            # + halos are inside it) cuts those rows out of the gather.
            on_screen = (
                (prep.xy[:, 0] + prep.radius > 0.0)
                & (prep.xy[:, 0] - prep.radius < float(width))
                & (prep.xy[:, 1] + prep.radius > 0.0)
                & (prep.xy[:, 1] - prep.radius < float(height))
            )
            vis = prep.valid & (prep.radius > 0) & on_screen
            n_vis = jnp.sum(vis.astype(jnp.int32))
            vis_overflow = jnp.maximum(n_vis - V, 0)
            idx = jnp.nonzero(vis, size=V, fill_value=Cn)[0].astype(jnp.int32)
            ok = idx < Cn
            idc = jnp.clip(idx, 0, Cn - 1)

            def take(a):
                return jnp.take(a, idc, axis=0)

            valid_v = ok & take(vis)
            # ---- the visibility-compressed all-gather ----
            ag = lambda a: jax.lax.all_gather(a, AXIS, axis=0, tiled=True)
            prep_all = prep.replace(
                valid=ag(valid_v),
                xy=ag(take(prep.xy)) - jnp.stack(
                    [jnp.float32(0.0), y0]
                )[None, :],
                depth=ag(take(prep.depth)),
                view_point=ag(take(prep.view_point)),
                conic=ag(take(prep.conic)),
                opacity=ag(jnp.where(valid_v, take(prep.opacity), 0.0)),
                rgb=ag(take(prep.rgb)),
                camera_plane=ag(take(prep.camera_plane)),
                ray_plane=ag(take(prep.ray_plane)),
                normal=ag(take(prep.normal)),
                ts=ag(take(prep.ts)),
                radius=ag(jnp.where(valid_v, take(prep.radius), 0.0)),
                well_conditioned=ag(take(prep.well_conditioned)),
                invraycov=None,
            )
            xy_abs_all = ag(take(xy_abs))

            # ---- band rasterization ----
            out = rasterize(
                prep_all, camera, bg,
                max_per_tile=pcfg.max_per_tile,
                instance_budget=budget,
                xy_abs=xy_abs_all,
                backend=backend,
                render_width=width,
                render_height=band_px,
                band_row0=y0,
            )

            rows_global = y0 + jnp.arange(band_px, dtype=jnp.float32)
            row_ok = (rows_global < height).astype(jnp.float32)[None, :, None]

            img = out["render"] * row_ok
            gt_m = gt_band * row_ok
            npix = 3.0 * height * width

            # IMPORTANT: everything below is the LOCAL band's loss part
            # divided by the GLOBAL denominator; the differentiated function
            # must contain NO psum (grad-of-psum over-counts by n with
            # replication checking off — the all_gather/ppermute transposes
            # already deliver the cross-device contributions exactly).
            # The reported loss is psum'd OUTSIDE the grad.
            if mcfg.use_decoupled_appearance and app_params is not None:
                # the appearance CNN needs the full image: all-gather the
                # bands (3 channels only), run replicated, count once (/n)
                img_full = jax.lax.all_gather(img, AXIS, axis=1, tiled=True)[:, :height]
                gt_full = jax.lax.all_gather(gt_m, AXIS, axis=1, tiled=True)[:, :height]
                net = AppearanceNetwork()
                transformed, (top, left, Hc, Wc) = appearance_transform(
                    net, app_params, img_full, view_idx)
                gt_crop = jax.lax.dynamic_slice(gt_full, (0, top, left), (3, Hc, Wc))
                l1 = l1_loss(transformed, gt_crop) / n
            else:
                l1 = jnp.sum(jnp.abs(img - gt_m)) / npix

            # SSIM via 5-row halo: interior windows see true neighbor rows;
            # the global top/bottom edges see zeros — identical to the
            # single-device 'same' zero padding
            h5 = 5
            img_h = _with_halo(img, h5, d, n)
            gt_h = _with_halo(gt_m, h5, d, n)
            smap = ssim_map(img_h, gt_h)[:, h5:-h5, :]
            ssim_part = jnp.sum(smap * row_ok) / npix

            # normal-consistency (train.py:141-155) via 1-row halo
            reg_on = (it >= ocfg.regularization_from_iter).astype(jnp.float32)
            if mcfg.use_coord_map:
                src1 = out["expected_coord"] * row_ok
                src2 = out["median_coord"] * row_ok
                pts = jnp.stack(
                    [_with_halo(src1, 1, d, n), _with_halo(src2, 1, d, n)], 0
                )
            else:
                dep1 = _with_halo(out["expected_depth"] * row_ok, 1, d, n)
                dep2 = _with_halo(out["median_depth"] * row_ok, 1, d, n)
                p1 = _band_depths_to_points(camera, dep1[0], y0 - 1.0)
                p2 = _band_depths_to_points(camera, dep2[0], y0 - 1.0)
                pts = jnp.stack([p1, p2], axis=0)
            ref_normals = _points_to_normal_nopad(pts)  # (2,3,band,W)
            # zero the global image border rows (core.geometry pads them)
            border = (
                (rows_global <= 0) | (rows_global >= height - 1)
            ).astype(jnp.float32)[None, None, :, None]
            ref_normals = ref_normals * (1.0 - border) * row_ok[None]
            err = 1.0 - jnp.sum(out["normal"][None] * ref_normals, axis=1)
            hw = float(height * width)
            # bands partition the rows y < H exactly once, so local sums
            # psum to the global means
            e0 = jnp.sum(err[0] * row_ok[0]) / hw
            e1 = jnp.sum(err[1] * row_ok[0]) / hw
            dn_part = 0.4 * e0 + 0.6 * e1

            # local part of: (1-lam) l1 + lam (1 - ssim) + reg dn
            # the constant "lam * 1" is split evenly by carrying lam/n
            loss_part = (
                (1.0 - lam) * l1
                + lam * (1.0 / n - ssim_part)
                + reg_on * ocfg.lambda_depth_normal * dn_part
            )

            mse_part = jnp.sum((img - gt_m) ** 2) / npix
            aux = {
                "l1_part": l1,
                "dn_part": dn_part,
                "mse_part": mse_part,
                "radii": jnp.where(vis, prep.radius, 0.0),  # shard-local
                "visibility": vis,
                "vis_overflow": vis_overflow,
                "n_vis": jnp.minimum(n_vis, V),  # rows actually carried
                "n_vis_raw": n_vis,  # pre-cap count (V autotune signal)
                "n_overflow": out["binning"].n_overflow,
                "tile_overflow": out["binning"].tile_overflow,
                "n_instances": out["binning"].n_instances,
            }
            return loss_part, aux

        (loss_part, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(g.params, ts.app_params, zeros2, zeros2)
        g_params, g_app, g_xy, g_xyabs = grads
        # app_params are REPLICATED inputs: no collective sits in their
        # gradient path, so each device holds only its 1/n share — psum it
        if g_app is not None:
            g_app = jax.tree.map(lambda x: jax.lax.psum(x, AXIS), g_app)
        loss = jax.lax.psum(loss_part, AXIS)

        xyz_lr = expon_lr(
            it.astype(jnp.float32),
            ocfg.position_lr_init * spatial_lr_scale,
            ocfg.position_lr_final * spatial_lr_scale,
            ocfg.position_lr_max_steps,
            lr_delay_mult=ocfg.position_lr_delay_mult,
        )
        lrs = GroupLRs(
            xyz=xyz_lr, f_dc=ocfg.feature_lr, f_rest=ocfg.feature_lr / 20.0,
            opacity=ocfg.opacity_lr, scaling=ocfg.scaling_lr,
            rotation=ocfg.rotation_lr,
        )
        g2 = adam_step(g, g_params, lrs)

        # appearance Adam (replicated params; grads identical on every
        # device by construction)
        app_params, app_m, app_v = ts.app_params, ts.app_m, ts.app_v
        if app_params is not None:
            bc1 = 1.0 - BETA1 ** it.astype(jnp.float32)
            bc2 = 1.0 - BETA2 ** it.astype(jnp.float32)

            def upd(p_, gg_, m_, v_, lr_):
                m_ = BETA1 * m_ + (1 - BETA1) * gg_
                v_ = BETA2 * v_ + (1 - BETA2) * gg_ * gg_
                return p_ - lr_ * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + EPS), m_, v_

            lr_tree = {
                "net": jax.tree.map(
                    lambda _: ocfg.appearance_network_lr, app_params["net"]
                ),
                "embeddings": ocfg.appearance_embeddings_lr,
            }
            out3 = jax.tree.map(upd, app_params, g_app, app_m, app_v, lr_tree)
            pick = lambda i: jax.tree.map(
                lambda t_: t_[i], out3, is_leaf=lambda x: isinstance(x, tuple)
            )
            app_params, app_m, app_v = pick(0), pick(1), pick(2)

        ndc_scale = jnp.array([width * 0.5, height * 0.5], jnp.float32)
        g2 = gm.add_densification_stats(
            g2, g_xy * ndc_scale, g_xyabs[:, 0], aux["visibility"]
        )
        g2 = gm.update_max_radii(g2, aux["radii"], aux["visibility"])

        mse = jax.lax.psum(aux["mse_part"], AXIS)
        metrics = {
            "loss": loss,
            "l1": jax.lax.psum(aux["l1_part"], AXIS),
            "depth_normal_loss": jax.lax.psum(aux["dn_part"], AXIS),
            "psnr": -10.0 * jnp.log10(mse),
            "n_vis_overflow": jax.lax.psum(aux["vis_overflow"], AXIS),
            "n_overflow": jax.lax.psum(aux["n_overflow"], AXIS),
            "tile_overflow": jax.lax.psum(aux["tile_overflow"], AXIS),
            "n_instances": jax.lax.psum(aux["n_instances"], AXIS),
            # communication-volume accounting (BASELINE.md weak scaling):
            # the forward all-gather moves the STATIC V rows/shard; these
            # let the harness report realized + ideal compression vs a full
            # parameter all-gather without any hardware timing
            "n_vis": jax.lax.psum(aux["n_vis"], AXIS),  # ideal (dynamic) rows
            # worst single shard's pre-cap visible count: the V autotune
            # (train loop) shrinks the static gather cap toward this peak
            "n_vis_max": jax.lax.pmax(aux["n_vis_raw"], AXIS),
            "gather_rows": jnp.float32(n * V),  # realized rows moved
            "full_gather_rows": jnp.float32(n * Cn),  # naive design's rows
        }
        return ts.replace(gaussians=g2, app_params=app_params, app_m=app_m,
                          app_v=app_v, iteration=it), metrics

    cache = {}

    def step(ts, camera, gt_padded, bg, view_idx=0):
        key = ts.gaussians.capacity
        if key not in cache:
            specs = _state_specs(ts)
            gt_spec = P(None, AXIS, None)
            shard_step = jax.shard_map(
                device_step,
                mesh=mesh,
                in_specs=(specs, P(), gt_spec, P(), P()),
                out_specs=(specs, P()),
                check_vma=False,
            )
            cache[key] = jax.jit(shard_step, donate_argnums=(0,))
        return cache[key](ts, camera, gt_padded, bg, jnp.asarray(view_idx, jnp.int32))

    return step

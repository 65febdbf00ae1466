"""TSDF fusion of rendered median depth + mesh extraction.

Native replacement for the reference's Open3D VoxelBlockGrid path
(mesh_extract.py:54-105): per view, render median depth masked at
alpha < 0.5 (and optional GT mask), then integrate a truncated SDF over a
dense voxel grid (processed in z-slabs on device), and mesh the zero level
set with marching tetrahedra over a 6-tet cube split (linear interpolation —
no binary search; the TSDF itself is already the refined field).

Matches the reference's integration constants: voxel 0.002 (DTU scale),
depth_scale 1.0, depth_max 8.0, truncation 8 voxels
(o3d VoxelBlockGrid.integrate trunc_voxel_multiplier default).
"""

from __future__ import annotations

import os
import time

import numpy as np

from radegs_tpu.mesh.tetmesh import marching_tetrahedra
from radegs_tpu.utils import ply as plyio

# 6-tetrahedra decomposition of a unit cube (corner ids by bit order x+2y+4z)
CUBE_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 5, 7],
        [0, 2, 3, 7],
        [0, 2, 6, 7],
        [0, 4, 5, 7],
        [0, 4, 6, 7],
    ],
    np.int64,
)


def render_depth_maps(state, views, kernel_size, bg, max_per_tile=1024,
                      alpha_thres=0.5, gt_masks=None):
    """(depths, extrinsics, intrinsics) per view (mesh_extract.py:49-61)."""
    import jax.numpy as jnp
    import numpy as np

    from radegs_tpu.renderer import render_compiled

    out = []
    for i, (cam, gt, vidx) in enumerate(views):
        pkg = render_compiled(state, cam, bg, kernel_size=kernel_size,
                              max_per_tile=max_per_tile)
        depth = np.asarray(pkg["median_depth"][0])
        mask = np.asarray(pkg["mask"][0])
        depth = np.where(mask < alpha_thres, 0.0, depth)
        if gt_masks is not None and gt_masks[i] is not None:
            depth = np.where(np.asarray(gt_masks[i]) < 0.5, 0.0, depth)
        fx = float(np.asarray(cam.focal_x))
        fy = float(np.asarray(cam.focal_y))
        K = np.array([[fx, 0, cam.width / 2.0], [0, fy, cam.height / 2.0], [0, 0, 1]])
        E = np.asarray(cam.world_view)  # w2c 4x4
        out.append((depth.astype(np.float32), E.astype(np.float32), K.astype(np.float32)))
    return out


def _backproject_all(depth_maps, stride=1):
    """World-space surface points from every valid depth pixel."""
    pts = []
    for depth, E, K in depth_maps:
        d = depth[::stride, ::stride]
        ys, xs = np.nonzero(d > 0)
        if len(ys) == 0:
            continue
        dd = d[ys, xs]
        x = (xs * stride + 0.5 - K[0, 2]) / K[0, 0] * dd
        y = (ys * stride + 0.5 - K[1, 2]) / K[1, 1] * dd
        pc = np.stack([x, y, dd], -1)
        pts.append((pc - E[:3, 3][None]) @ E[:3, :3])
    return np.concatenate(pts, 0) if pts else np.zeros((0, 3))


def fuse_tsdf(depth_maps, voxel_size=0.002, trunc_multiplier=8.0, depth_max=8.0,
              bounds=None, block=16, max_resolution=768, block_chunk=512,
              margin_voxels=None, io_dtype="f16"):
    """Integrate depth maps into a BLOCK-SPARSE TSDF grid.

    Samples only 16^3-voxel blocks within ``margin_voxels`` (default
    trunc + 2 voxels) of a back-projected surface point (the o3d
    VoxelBlockGrid allocation strategy the reference uses,
    mesh_extract.py:66-101). A surface (sign-change) cube needs a negative
    sample — a voxel within `trunc` behind some view's surface, inside the
    margin except under extreme grazing incidence — while the untouched
    far field has weight 0 and is excluded by tsdf_to_mesh's validity mask
    either way. Versus dense sampling this cuts the gather-bound sampling
    AND the device->host result transfer (the dominant cost through the
    TPU tunnel) ~20-80x; raise ``margin_voxels`` (e.g. to 2*block) for a
    strict superset of the one-block dilation a VoxelBlockGrid uses.

    ``io_dtype``: "f16" transfers sdf as float16 (+ weight as uint8) —
    sdf is in [-1, 1], so f16 keeps ~3 decimal digits, far below the
    voxel discretization error; pass "f32" for bit-identical-to-dense
    values.

    Returns (tsdf (Z,Y,X), weight (Z,Y,X), origin (3,), voxel_size).
    """
    import jax
    import jax.numpy as jnp

    trunc = trunc_multiplier * voxel_size
    _t_mark = time.perf_counter()
    surf_pts = _backproject_all(depth_maps)
    if bounds is None:
        if len(surf_pts) == 0:
            return (np.zeros((1, 1, 1), np.float32), np.zeros((1, 1, 1), np.float32),
                    np.zeros(3, np.float32), voxel_size)
        lo = surf_pts.min(0) - 4 * trunc
        hi = surf_pts.max(0) + 4 * trunc
        bounds = (lo, hi)
    lo, hi = bounds
    dims = np.ceil((hi - lo) / voxel_size).astype(np.int64) + 1
    if dims.max() > max_resolution:
        # keep memory bounded: coarsen the grid (documented cap, not silent)
        scale = dims.max() / max_resolution
        voxel_size *= float(scale)
        trunc = trunc_multiplier * voxel_size
        dims = np.ceil((hi - lo) / voxel_size).astype(np.int64) + 1
        print(f"[tsdf] grid capped to {dims} (voxel -> {voxel_size:.5f})")
    X, Y, Z = int(dims[0]), int(dims[1]), int(dims[2])
    # block grid (padded up so edge blocks are full)
    BX, BY, BZ = [-(-v // block) for v in (X, Y, Z)]

    # --- active blocks: every block overlapping any surface point's
    # +-(trunc + 2 voxel) AABB. Tighter than a full 26-neighbor dilation
    # (2-3x fewer blocks -> 2-3x less sampling AND less device->host
    # transfer, the dominant cost through the TPU tunnel) yet still covers
    # every voxel that can carry a surface sign change: a sign-change cube
    # needs a negative corner, i.e. a voxel within trunc BEHIND a surface,
    # plus one voxel of interpolation margin. The AABB spans at most 2
    # blocks per axis (trunc = 8 voxels < block = 16), so enumerate the 8
    # corner blocks.
    if margin_voxels is None:
        margin_voxels = trunc_multiplier + 2
    margin = margin_voxels * voxel_size
    bedge = block * voxel_size
    blo = np.floor((surf_pts - margin - lo[None]) / bedge).astype(np.int64)
    bhi = np.floor((surf_pts + margin - lo[None]) / bedge).astype(np.int64)
    # collapse the ~15M per-pixel AABBs to their unique few thousand before
    # the per-axis enumeration (memory)
    pair = np.unique(np.concatenate([blo, bhi], 1), axis=0)
    blo, bhi = pair[:, :3], pair[:, 3:]
    K = int(np.ceil(2 * margin / bedge))  # max blocks spanned per axis - 1
    ids = []
    for kx in range(K + 1):
        for ky in range(K + 1):
            for kz in range(K + 1):
                b = np.stack([
                    np.clip(np.minimum(blo[:, 0] + kx, bhi[:, 0]), 0, BX - 1),
                    np.clip(np.minimum(blo[:, 1] + ky, bhi[:, 1]), 0, BY - 1),
                    np.clip(np.minimum(blo[:, 2] + kz, bhi[:, 2]), 0, BZ - 1),
                ], -1)
                ids.append(b[:, 0] + b[:, 1] * BX + b[:, 2] * BX * BY)
    active = np.unique(np.concatenate(ids))
    NB = len(active)
    _dbg = os.environ.get("RADEGS_TSDF_DEBUG")
    if _dbg:
        print(f"[tsdf] NB={NB} active blocks "
              f"({NB * block ** 3 / 1e6:.0f}M voxels, "
              f"{NB * block ** 3 * 3 / 1e6:.0f} MB f16+u8), "
              f"mark {time.perf_counter() - _t_mark:.1f} s", flush=True)

    Es = jnp.asarray(np.stack([E for _, E, _ in depth_maps]))
    Ks = jnp.asarray(np.stack([K for _, _, K in depth_maps]))
    Ds = jnp.asarray(np.stack([d for d, _, _ in depth_maps]))
    H, W = depth_maps[0][0].shape

    # block-local voxel offsets (block^3, 3) in xyz order
    zz, yy, xx = np.meshgrid(np.arange(block), np.arange(block), np.arange(block),
                             indexing="ij")
    local = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32) * voxel_size

    @jax.jit
    def sample_blocks(origins, Es, Ks, Ds):
        pts = origins[:, None, :] + jnp.asarray(local)[None]  # (nb, b^3, 3)

        def per_view(E, K, D):
            pc = pts @ E[:3, :3].T + E[:3, 3]
            z = pc[..., 2]
            u = K[0, 0] * pc[..., 0] / jnp.maximum(z, 1e-9) + K[0, 2]
            v = K[1, 1] * pc[..., 1] / jnp.maximum(z, 1e-9) + K[1, 2]
            ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
            dsmp = jnp.take(D.reshape(-1), vi * W + ui)
            inside = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
            sdf = dsmp - z
            valid = inside & (dsmp > 0) & (z < depth_max) & (sdf > -trunc)
            return jnp.where(valid, jnp.clip(sdf / trunc, -1.0, 1.0), 0.0), valid

        sdfs, valids = jax.vmap(per_view)(Es, Ks, Ds)
        w = jnp.sum(valids.astype(jnp.float32), axis=0)
        s = jnp.sum(sdfs, axis=0) / jnp.maximum(w, 1.0)
        # compact transfer dtypes: the tunnel's device->host bandwidth is
        # the dominant fusion cost; sdf is in [-1,1] (f16 keeps ~3 decimal
        # digits, far below the voxel discretization) and weight is a view
        # count <= 255
        if io_dtype == "f16":
            return s.astype(jnp.float16), w.astype(jnp.uint8)
        return s, w.astype(jnp.uint8)

    abx, aby, abz = active % BX, (active // BX) % BY, active // (BX * BY)
    outs = []
    for c0 in range(0, NB, block_chunk):
        sel = slice(c0, min(c0 + block_chunk, NB))
        n_sel = sel.stop - sel.start
        orig = np.stack([abx[sel], aby[sel], abz[sel]], -1).astype(np.float32)
        orig = lo[None] + orig * (block * voxel_size)
        if n_sel < block_chunk:  # pad to the static shape
            orig = np.concatenate(
                [orig, np.zeros((block_chunk - n_sel, 3), np.float32)], 0)
        # keep results on device; fetch after ALL chunks are enqueued so
        # transfers overlap compute instead of a sync round-trip per chunk
        outs.append(sample_blocks(jnp.asarray(orig), Es, Ks, Ds))
    if _dbg:
        _t_disp = time.perf_counter()
        print(f"[tsdf] dispatched {len(outs)} chunks", flush=True)
    s_all = np.concatenate([np.asarray(s) for s, _ in outs])[:NB]
    w_all = np.concatenate([np.asarray(w) for _, w in outs])[:NB]
    if _dbg:
        print(f"[tsdf] compute+fetch {time.perf_counter() - _t_disp:.1f} s",
              flush=True)
    # vectorized block scatter (a python per-block loop costs ~30us x NB)
    tsdf6 = np.zeros((BZ, BY, BX, block, block, block), np.float32)
    weight6 = np.zeros((BZ, BY, BX, block, block, block), np.float32)
    tsdf6[abz, aby, abx] = s_all.reshape(NB, block, block, block).astype(np.float32)
    weight6[abz, aby, abx] = w_all.reshape(NB, block, block, block)
    tsdf = tsdf6.transpose(0, 3, 1, 4, 2, 5).reshape(BZ * block, BY * block, BX * block)
    weight = weight6.transpose(0, 3, 1, 4, 2, 5).reshape(BZ * block, BY * block, BX * block)
    return tsdf[:Z, :Y, :X], weight[:Z, :Y, :X], np.asarray(lo, np.float32), voxel_size


def tsdf_to_mesh(tsdf, weight, origin, voxel_size, min_weight=1.0):
    """Zero-level-set mesh via marching tetrahedra over surface cubes."""
    Z, Y, X = tsdf.shape
    occ = tsdf > 0
    valid = weight >= min_weight
    # surface cubes: all 8 corners valid and signs mixed. In-place
    # accumulators instead of stacking 8 shifted (Z,Y,X) views (several GB
    # of transient allocations at 768^3)
    n_in = np.zeros((Z - 1, Y - 1, X - 1), np.uint8)
    all_val = np.ones((Z - 1, Y - 1, X - 1), np.bool_)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                n_in += occ[dz : Z - 1 + dz, dy : Y - 1 + dy, dx : X - 1 + dx]
                all_val &= valid[dz : Z - 1 + dz, dy : Y - 1 + dy, dx : X - 1 + dx]
    surf = all_val & (n_in > 0) & (n_in < 8)
    del n_in, all_val
    cz, cy, cx = np.nonzero(surf)
    if len(cz) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # corner offsets in the same bit order as `corners`: bit0..7 = (dz,dy,dx)
    offs = np.array([(dz, dy, dx) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
                    np.int64)
    corner_idx = (
        (cz[:, None] + offs[None, :, 0]) * (Y * X)
        + (cy[:, None] + offs[None, :, 1]) * X
        + (cx[:, None] + offs[None, :, 2])
    )  # (C,8) flat grid vertex ids
    tets = corner_idx[:, CUBE_TETS].reshape(-1, 4)  # (C*6,4)

    used, inv = np.unique(tets.reshape(-1), return_inverse=True)
    tets_local = inv.reshape(-1, 4)
    uz = used // (Y * X)
    uy = (used % (Y * X)) // X
    ux = used % X
    verts_grid = origin[None] + np.stack([ux, uy, uz], -1).astype(np.float64) * voxel_size
    sdf_local = tsdf.reshape(-1)[used]

    edge_points, edge_sdf, _, faces = marching_tetrahedra(
        verts_grid, tets_local, sdf_local, np.ones_like(sdf_local)
    )
    # linear interpolation to the zero crossing
    s0, s1 = edge_sdf[:, 0], edge_sdf[:, 1]
    t = np.clip(np.abs(s0) / np.maximum(np.abs(s0 - s1), 1e-12), 0.0, 1.0)
    verts = edge_points[:, 0] + t[:, None] * (edge_points[:, 1] - edge_points[:, 0])
    return verts.astype(np.float32), faces


def extract_mesh_tsdf(state, views, kernel_size, bg, voxel_size=0.002,
                      out_path=None, gt_masks=None, max_per_tile=1024,
                      max_resolution=768, verbose=True):
    """The reference mesh_extract.py pipeline end-to-end."""
    maps = render_depth_maps(state, views, kernel_size, bg,
                             max_per_tile=max_per_tile, gt_masks=gt_masks)
    if verbose:
        print(f"rendered {len(maps)} depth maps")
    tsdf, weight, origin, vsz = fuse_tsdf(maps, voxel_size=voxel_size,
                                          max_resolution=max_resolution)
    if verbose:
        print(f"tsdf grid {tsdf.shape}, voxel {vsz:.5f}")
    verts, faces = tsdf_to_mesh(tsdf, weight, origin, vsz)
    if out_path is not None:
        plyio.write_mesh(out_path, verts, faces)
        if verbose:
            print(f"wrote {out_path}: {verts.shape[0]} verts, {faces.shape[0]} faces")
    return verts, faces

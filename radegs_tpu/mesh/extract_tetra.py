"""Marching-Tetrahedra surface extraction (mesh_extract_tetrahedra.py).

Pipeline (reference :59-112):
1. seed points = Gaussian box corners @3sigma + centers (get_tetra_points)
2. Delaunay tetrahedralization — scipy.spatial.Delaunay on the host replaces
   the CGAL extension (tetra_triangulation/src/triangulation.cpp:28-69)
3. SDF(p) = 0.5 - min over views of alpha_integrated(p), masked to views
   where p projects inside a valid-alpha region (evaluage_cull_alpha :32-56)
4. marching tetrahedra -> crossing edges + faces
5. 8-step binary search along each crossing edge re-evaluating the SDF
6. filter edges longer than the summed endpoint scales; export PLY
"""

from __future__ import annotations

import numpy as np

from radegs_tpu.mesh.tetmesh import marching_tetrahedra
from radegs_tpu.models.gaussian_model import get_tetra_points
from radegs_tpu.utils import ply as plyio


def _bilinear_sample(img, xy, H, W):
    """grid_sample(align_corners=False, padding=zeros) equivalent.

    img: (H,W) np.float32; xy: (N,2) pixel coordinates (not normalized).
    The reference normalizes point_coordinate to [-1,1] via (x*2+1)/(W-1)-1
    then grid_samples; that pair of mappings lands on sample position
    (x+0.5)*W/(W-1)-0.5 in pixel units — reproduced exactly here.
    """
    gx = (xy[:, 0] * 2 + 1) / (W - 1) - 1
    gy = (xy[:, 1] * 2 + 1) / (H - 1) - 1
    fx = ((gx + 1) * W - 1) / 2
    fy = ((gy + 1) * H - 1) / 2
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = fx - x0
    wy = fy - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)]
        return np.where(inside, v, 0.0)

    return (
        tap(x0, y0) * (1 - wx) * (1 - wy)
        + tap(x0 + 1, y0) * wx * (1 - wy)
        + tap(x0, y0 + 1) * (1 - wx) * wy
        + tap(x0 + 1, y0 + 1) * wx * wy
    )


def decimate_seed_points(points, scales, voxel):
    """Voxel-dedup the tetrahedralization seeds: one representative (the
    largest-scale member) per ``voxel``-sized cell.

    The reference seeds 9 points per Gaussian (8 corners @3sigma + center,
    gaussian_model.py:399-429) and pays CGAL Delaunay on all of them; on a
    converged surface neighboring splats' seed boxes overlap heavily, so a
    voxel dedup at ~1 sigma (chamfer within 0.4% of full seeds on the
    measured quality sweep; 2 sigma costs 11%) drops ~60% of the points
    without changing which tetra edges cross the surface — cutting the
    dominant host
    Delaunay term ~15x AND every SDF pass of the binary search ~10x.
    Keeping the max member scale keeps the edge-length filter
    (mesh_extract_tetrahedra.py:107-110) conservative."""
    q = np.floor(points / voxel).astype(np.int64)
    q -= q.min(axis=0)
    dims = q.max(axis=0) + 1
    key = (q[:, 0] * dims[1] + q[:, 1]) * dims[2] + q[:, 2]
    order = np.lexsort((-scales, key))  # per cell: largest scale first
    ks = key[order]
    first = order[np.concatenate([[True], ks[1:] != ks[:-1]])]
    return points[first], scales[first]


def evaluate_cull_alpha(points, views, masks, state, kernel_size, bg,
                        max_per_tile=1024, instance_budget=None,
                        point_chunk_size=262_144, progress=None, caches=None):
    """SDF = 0.5 - min over valid views of alpha_integrated
    (mesh_extract_tetrahedra.py:32-56); -100 where no view sees the point.

    ``caches``: optional per-view (prep, cache) pairs from
    renderer.integrate_prepare_compiled — the points-independent half
    (preprocess + binning + phase-A image) is then reused across calls,
    which the binary search makes 1 + n_steps times."""
    import jax.numpy as jnp

    from radegs_tpu.renderer import (
        integrate_compiled,
        integrate_points_compiled,
    )

    N = points.shape[0]
    final = np.ones(N, np.float32)
    weight = np.zeros(N, np.int32)
    for ci, (cam, gt, vidx) in enumerate(views):
        H, W = cam.height, cam.width
        alphas = np.empty(N, np.float32)
        coords = np.empty((N, 2), np.float32)
        mask_img = None
        for s in range(0, N, point_chunk_size):
            e = min(s + point_chunk_size, N)
            # pad the tail chunk to the full size: one jit compile total
            chunk = points[s:e]
            pad = point_chunk_size - chunk.shape[0] if N > point_chunk_size else 0
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
            if caches is not None:
                prep, cache = caches[ci]
                ret = integrate_points_compiled(jnp.asarray(chunk), prep, cache, cam)
            else:
                ret = integrate_compiled(jnp.asarray(chunk), state, cam, bg,
                                         kernel_size=kernel_size,
                                         max_per_tile=max_per_tile,
                                         instance_budget=instance_budget)
            alphas[s:e] = np.asarray(ret["alpha_integrated"])[: e - s]
            coords[s:e] = np.asarray(ret["point_coordinate"])[: e - s]
            if mask_img is None:
                mask_img = np.asarray(ret["render"][7])
        if masks is not None and masks[ci] is not None:
            mask_img = mask_img * np.asarray(masks[ci])
        prob = _bilinear_sample(mask_img.astype(np.float32), coords, H, W)
        ok = prob > 0.5
        final = np.where(ok, np.minimum(alphas, final), final)
        weight = np.where(ok, weight + 1, weight)
        if progress:
            progress(ci, len(views))
    return np.where(weight > 0, 0.5 - final, -100.0).astype(np.float32)


def extract_mesh_tetrahedra(state, views, kernel_size, bg, masks=None,
                            out_path=None, n_binary_steps=8, max_per_tile=1024,
                            instance_budget=None, verbose=True,
                            decimate="auto"):
    """Full extractor (mesh_extract_tetrahedra.py:59-112). Returns
    (vertices, faces) and optionally writes out_path.

    ``decimate``: voxel size for seed-point dedup before the Delaunay
    ("auto" = ONE median splat sigma, None/0 = reference-exact seeds).
    """
    from scipy.spatial import Delaunay

    points, point_scales = get_tetra_points(state)
    if verbose:
        print(f"tetra points: {points.shape[0]}")
    if decimate:
        # point_scales are 3*sigma_max, so k*sigma = median(scales)*k/3.
        # auto = 1 sigma, chosen by the MEASURED quality sweep
        # (DECIM_SWEEP_R4_CPU.json, analytic-surface chamfer): 1-sigma
        # dedup matches full seeds within 0.4% chamfer at ~2x Delaunay
        # speedup, while the round-3 wall-clock-only choice of 2 sigma
        # (10% of seeds kept, 465 s -> 30 s) measured an 11% chamfer
        # penalty. Speed-hungry callers pass an explicit voxel.
        voxel = (float(np.median(point_scales)) * (1.0 / 3.0)
                 if decimate == "auto" else float(decimate))
        if voxel > 0:
            points, point_scales = decimate_seed_points(
                points, point_scales, voxel)
            if verbose:
                print(f"decimated to {points.shape[0]} seeds "
                      f"(voxel {voxel:.4g})")
    # qhull is strongly insertion-order sensitive: the voxel-dedup's
    # key-sorted order measured 1.7x SLOWER than a random shuffle
    perm = np.random.default_rng(0).permutation(points.shape[0])
    points, point_scales = points[perm], point_scales[perm]
    cells = Delaunay(points).simplices.astype(np.int64)  # (M,4)
    if verbose:
        print(f"delaunay cells: {cells.shape[0]}")

    # prepare the points-independent half (preprocess + binning + phase-A
    # image) ONCE per view; the binary search then pays only phase B
    from radegs_tpu.renderer import integrate_prepare_compiled

    caches = [
        integrate_prepare_compiled(state, cam, bg, kernel_size=kernel_size,
                                   max_per_tile=max_per_tile,
                                   instance_budget=instance_budget)
        for cam, _, _ in views
    ]

    def sdf_of(pts):
        return evaluate_cull_alpha(
            pts, views, masks, state, kernel_size, bg,
            max_per_tile=max_per_tile, instance_budget=instance_budget,
            caches=caches,
            progress=(lambda i, n: print(f"  view {i + 1}/{n}", end="\r"))
            if verbose else None,
        )

    sdf = sdf_of(points)
    edge_points, edge_sdf, edge_scales, faces = marching_tetrahedra(
        points, cells, sdf, point_scales
    )
    if verbose:
        print(f"\ncrossing edges: {edge_points.shape[0]}, faces: {faces.shape[0]}")

    left = edge_points[:, 0].astype(np.float32).copy()
    right = edge_points[:, 1].astype(np.float32).copy()
    left_sdf = edge_sdf[:, 0].astype(np.float32).copy()
    right_sdf = edge_sdf[:, 1].astype(np.float32).copy()
    distance = np.linalg.norm(left - right, axis=-1)
    scale_sum = edge_scales[:, 0] + edge_scales[:, 1]

    for step in range(n_binary_steps):
        if verbose:
            print(f"binary search step {step}")
        mid = (left + right) / 2
        mid_sdf = sdf_of(mid)
        low = ((mid_sdf < 0) & (left_sdf < 0)) | ((mid_sdf > 0) & (left_sdf > 0))
        left_sdf = np.where(low, mid_sdf, left_sdf)
        right_sdf = np.where(low, right_sdf, mid_sdf)
        left = np.where(low[:, None], mid, left)
        right = np.where(low[:, None], right, mid)
    verts = (left + right) / 2

    # edge-length vs scale filter (mesh_extract_tetrahedra.py:107-110)
    vmask = distance <= scale_sum
    fmask = vmask[faces].all(axis=1)
    remap = np.full(verts.shape[0], -1, np.int64)
    remap[vmask] = np.arange(int(vmask.sum()))
    verts = verts[vmask]
    faces = remap[faces[fmask]]

    if out_path is not None:
        plyio.write_mesh(out_path, verts, faces)
        if verbose:
            print(f"wrote {out_path}: {verts.shape[0]} verts, {faces.shape[0]} faces")
    return verts, faces

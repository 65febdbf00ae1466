"""Unbounded-scene mesh extraction in contracted space.

TPU-native port of the reference's experimental 2DGS extractor
(utils/mesh_utils.py:163-270 ``extract_mesh_unbounded`` +
utils/mcube_utils.py:17-95 ``marching_cubes_with_contraction``): render
per-view median depth (+rgb), define the Mip-NeRF-360 scene contraction
around the camera ring's focus point, evaluate a truncated SDF on a dense
grid in CONTRACTED coordinates (adaptive truncation grows with contracted
radius), mesh the zero level set, and map vertices back through the inverse
contraction.

TPU-first re-design:
- the SDF fusion is a jitted per-block kernel (static shapes, one pass over
  all views per block) instead of a torch grid_sample loop;
- blocks are evaluated on DEVICE and only blocks whose [min, max] straddles
  the level set are fetched (the reference skips crops the same way,
  mcube_utils.py:70 — here it also cuts device->host transfer, the
  dominant cost through the TPU tunnel, by ~10-100x);
- meshing reuses the 6-tet marching-tetrahedra split of mesh/tsdf.py
  instead of skimage marching cubes.

Documented divergence: the reference computes the adaptive-truncation mask
from the norm of fully inverse-contracted WORLD points
(mesh_utils.py:198-202) — i.e. including the scene center offset — which
mixes frames; we use the norm of the UNCONTRACTED NORMALIZED point (the
quantity the 1/(2-r) Jacobian actually depends on). For center ~ 0,
radius ~ 1 scenes the two coincide.
"""

from __future__ import annotations

import numpy as np

from radegs_tpu.mesh.tsdf import tsdf_to_mesh
from radegs_tpu.utils import ply as plyio


def contract(x):
    """Mip-NeRF-360 scene contraction (mesh_utils.py:171-173)."""
    mag = np.linalg.norm(x, axis=-1, keepdims=True)
    mag = np.maximum(mag, 1e-12)
    return np.where(mag < 1, x, (2 - 1 / mag) * (x / mag))


def uncontract(y):
    """Inverse contraction, valid for |y| < 2 (mesh_utils.py:175-177)."""
    mag = np.linalg.norm(y, axis=-1, keepdims=True)
    mag = np.maximum(mag, 1e-12)
    return np.where(mag < 1, y, 1 / np.maximum(2 - mag, 1e-6) * (y / mag))


def focus_point(c2ws):
    """Nearest point to all camera focal axes (render_utils.py:69-75).

    ``c2ws``: (N, 4, 4) or (N, 3, 4) camera-to-world matrices. The
    reference flips to OpenGL axes first (mesh_utils.py:237); the flip
    negates the direction vectors, which the projector m = I - d d^T is
    invariant to, so we use the OpenCV c2w directly."""
    poses = np.asarray(c2ws)[:, :3, :]
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, (0, 2, 1))
    mt_m = np.transpose(m, (0, 2, 1)) @ m
    return np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]


def scene_normalization(cameras):
    """(center, radius): contraction frame from the camera ring
    (mesh_utils.py:236-242: center = focus point, radius = min camera
    distance to it)."""
    c2ws = []
    for cam in cameras:
        w2c = np.asarray(cam.world_view, np.float64)
        c2ws.append(np.linalg.inv(w2c))
    c2ws = np.stack(c2ws)
    center = focus_point(c2ws)
    radius = float(np.linalg.norm(c2ws[:, :3, 3] - center, axis=-1).min())
    return center.astype(np.float32), radius


def render_rgbd(state, views, kernel_size, bg, max_per_tile=1024):
    """Per-view (rgb (3,H,W), median depth (H,W), full_proj (4,4)) device
    arrays (the reconstruction pass, mesh_utils.py:92-116; depth is
    'middepth' = median depth, alpha-masked at 0.5 like the TSDF path)."""
    import jax.numpy as jnp

    from radegs_tpu.renderer import render_compiled

    out = []
    for cam, _gt, _i in views:
        pkg = render_compiled(state, cam, bg, kernel_size=kernel_size,
                              max_per_tile=max_per_tile)
        depth = jnp.where(pkg["mask"][0] < 0.5, 0.0, pkg["median_depth"][0])
        out.append((jnp.clip(pkg["render"], 0.0, 1.0), depth,
                    jnp.asarray(cam.full_proj)))
    return out


def _make_fuser(rgbds, width, height, want_rgb):
    """jit-compiled (world_pts (n,3), sdf_trunc (n,)) -> (tsdf, rgb) running
    -mean fusion over all views (mesh_utils.py:179-232)."""
    import jax
    import jax.numpy as jnp

    rgbs = jnp.stack([r for r, _, _ in rgbds])
    depths = jnp.stack([d for _, d, _ in rgbds])
    projs = jnp.stack([p for _, _, p in rgbds])
    W, H = width, height

    def sample_border(img, u, v):
        # grid_sample(bilinear, border, align_corners=True) on pixel coords
        u = jnp.clip(u, 0.0, W - 1.0)
        v = jnp.clip(v, 0.0, H - 1.0)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        u1 = jnp.minimum(u0 + 1, W - 1)
        v1 = jnp.minimum(v0 + 1, H - 1)
        fu, fv = u - u0, v - v0

        def tap(vv, uu):
            idx = (vv * W + uu).astype(jnp.int32)
            return jnp.take(img.reshape(img.shape[0], -1), idx, axis=1)

        return ((1 - fu) * (1 - fv) * tap(v0, u0) + fu * (1 - fv) * tap(v0, u1)
                + (1 - fu) * fv * tap(v1, u0) + fu * fv * tap(v1, u1))

    @jax.jit
    def fuse(pts, sdf_trunc):
        n = pts.shape[0]
        init = (jnp.ones((n,), jnp.float32),            # tsdf = 1
                jnp.zeros((3, n), jnp.float32),          # rgb
                jnp.ones((n,), jnp.float32))             # weight = 1

        def per_view(carry, inp):
            tsdf, rgb, w = carry
            rgbmap, depth, proj = inp
            ph = pts @ proj[:, :3].T + proj[:, 3]  # (n,4) row-major clip
            z = ph[:, 3]
            ndc = ph[:, :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)[:, None]
            in_ndc = jnp.all((ndc > -1.0) & (ndc < 1.0), axis=1) & (z > 0)
            u = (ndc[:, 0] + 1) * 0.5 * (W - 1)
            v = (ndc[:, 1] + 1) * 0.5 * (H - 1)
            d = sample_border(depth[None], u, v)[0]
            c = sample_border(rgbmap, u, v)
            sdf = d - z
            ok = in_ndc & (sdf > -sdf_trunc)
            sdf = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
            wp = w + ok.astype(jnp.float32)
            tsdf = jnp.where(ok, (tsdf * w + sdf) / wp, tsdf)
            rgb = jnp.where(ok[None], (rgb * w[None] + c) / wp[None], rgb)
            w = wp
            return (tsdf, rgb, w), None

        (tsdf, rgb, w), _ = jax.lax.scan(per_view, init, (rgbs, depths, projs))
        n_obs = w - 1.0  # real observations (the init value carries w=1)
        return (tsdf, rgb, n_obs) if want_rgb else (tsdf, None, n_obs)

    return fuse


def extract_mesh_unbounded(state, views, kernel_size, bg, resolution=512,
                           block=64, out_path=None, max_range=32.0,
                           color=True, max_per_tile=1024, verbose=True,
                           mask_unobserved=True):
    """Contracted-space extraction end-to-end (mesh_utils.py:163-270).

    ``mask_unobserved`` (divergence from the reference, default on): only
    cubes ALL of whose corners received at least one real depth observation
    are meshed. The reference initializes every sample to tsdf=1 and meshes
    everything, so the frontier between fused-negative space (just behind a
    surface) and never-observed space (deeper than the truncation band)
    produces a spurious interior shell ~5 voxels behind every closed
    surface; masking removes exactly that shell and nothing else (a real
    surface crossing has observed corners on both sides by construction of
    the truncation band). Pass False for reference-exact behavior.

    Returns (verts (V,3) world, faces (F,3)[, vert_colors (V,3)])."""
    import jax.numpy as jnp

    assert resolution % block == 0
    cams = [v[0] for v in views]
    W, H = cams[0].width, cams[0].height
    center, radius = scene_normalization(cams)
    voxel_size = radius * 2.0 / resolution  # mesh_utils.py:246 (world units)

    rgbds = render_rgbd(state, views, kernel_size, bg,
                        max_per_tile=max_per_tile)
    fuse = _make_fuser(rgbds, W, H, color)

    # grid bound: 95th percentile of contracted splat radii (mesh_utils:251)
    xyz = np.asarray(state.params.xyz)[np.asarray(state.active)]
    cr = np.linalg.norm(contract((xyz - center) / radius), axis=-1)
    R = min(float(np.quantile(cr, 0.95)) + 0.01, 1.9)
    if verbose:
        print(f"[unbounded] center {center.round(3)} radius {radius:.3f} "
              f"grid R {R:.3f} resolution {resolution}", flush=True)

    # contracted grid, evaluated per block^3 on device; fetch only blocks
    # whose [min, max] straddles 0 (mcube_utils.py:70's crop skip)
    NB = resolution // block
    axis = np.linspace(-R, R, resolution, dtype=np.float32)
    gvox = 2.0 * R / (resolution - 1)  # contracted-space grid step
    zz, yy, xx = np.meshgrid(np.arange(block), np.arange(block),
                             np.arange(block), indexing="ij")
    local = np.stack([xx, yy, zz], -1).reshape(-1, 3)

    def block_pts(bi, bj, bk):  # (block^3, 3) contracted coords, x fastest
        base = np.array([axis[bk * block], axis[bj * block],
                         axis[bi * block]], np.float32)
        return base[None] + local.astype(np.float32) * gvox

    results = []  # (bi,bj,bk) -> device (tsdf, n_obs) values
    for bi in range(NB):
        for bj in range(NB):
            for bk in range(NB):
                y = block_pts(bi, bj, bk)
                mag_n = np.linalg.norm(uncontract(y), axis=-1)
                world = uncontract(y) * radius + center[None]
                trunc = 5.0 * voxel_size * np.where(
                    mag_n > 1, 1.0 / np.maximum(2.0 - np.minimum(mag_n, 1.9),
                                                1e-6), 1.0)
                tsdf, _, n_obs = fuse(jnp.asarray(world), jnp.asarray(trunc))
                results.append(((bi, bj, bk), tsdf, n_obs))
    # one tiny fetch of per-block minima, then fetch every block that holds
    # any non-positive value: all-positive blocks keep the far-field init 1
    # and can never contribute a sign change against their neighbors
    mins = np.array([float(t.min()) for _, t, _ in results])
    grid = np.ones((resolution, resolution, resolution), np.float32)
    wgrid = np.ones((resolution, resolution, resolution), np.float32)
    n_fetch = 0
    for ((bi, bj, bk), t, nob), lo in zip(results, mins):
        if lo > 0.0:
            continue
        sl = (slice(bi * block, (bi + 1) * block),
              slice(bj * block, (bj + 1) * block),
              slice(bk * block, (bk + 1) * block))
        grid[sl] = np.asarray(t, np.float32).reshape(block, block, block)
        wgrid[sl] = np.asarray(nob, np.float32).reshape(block, block, block)
        n_fetch += 1
    if verbose:
        print(f"[unbounded] fetched {n_fetch}/{len(results)} blocks",
              flush=True)

    # mesh in contracted coords (grid is (z,y,x)-indexed for tsdf_to_mesh)
    origin = np.array([-R, -R, -R], np.float32)
    verts_c, faces = tsdf_to_mesh(
        grid, wgrid if mask_unobserved else np.full_like(grid, 2.0), origin,
        gvox, min_weight=1.0)
    if len(verts_c) == 0:
        if color:
            return verts_c, faces, np.zeros((0, 3), np.float32)
        return verts_c, faces
    verts = uncontract(verts_c.astype(np.float64)) * radius + center[None]
    verts = np.clip(verts, -max_range, max_range).astype(np.float32)

    cols = None
    if color:
        # texture by re-fusing rgb at the world vertices (mesh_utils:264-269)
        cols = []
        for s0 in range(0, len(verts), 1 << 18):
            chunk = jnp.asarray(verts[s0:s0 + (1 << 18)])
            _, rgb, _ = fuse(chunk, jnp.full((chunk.shape[0],),
                                             5.0 * voxel_size, jnp.float32))
            cols.append(np.asarray(rgb).T)
        cols = np.clip(np.concatenate(cols), 0.0, 1.0)

    if out_path is not None:
        plyio.write_mesh(out_path, verts, faces,
                         vertex_colors=cols if color else None)
        if verbose:
            print(f"[unbounded] wrote {out_path}: {len(verts)} verts, "
                  f"{len(faces)} faces", flush=True)
    return (verts, faces, cols) if color else (verts, faces)

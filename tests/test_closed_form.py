"""Closed-form absolute-correctness anchors.

Unlike the oracle-chain tests (FD oracle -> exact renderer -> scan ->
Pallas), these pin the rendered depth / normal / coordinate maps against
values derived purely from GEOMETRY — the quantities RaDe-GS's math is
designed to produce (README.md:14: d = cos(theta) * t*, analytic normals,
camera-space coordinate maps; forward.cu:135-262):

1. A flat disk Gaussian (scale (s, s, eps)) IS a plane patch: every ray
   must report the ray/plane intersection distance, the plane normal, and
   the intersection point — all closed-form.
2. An isotropic Gaussian's max-density point along a ray u is (c.u) u, so
   the ray-space distance is c.u — closed form for every pixel.

The renderer's depth output divides the ray distance t by ln = |(nx,ny,1)|
(forward.cu:466-467,662-672), which these tests re-apply analytically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from radegs_tpu.core.camera import Camera
from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.ops.rasterize import rasterize

W = H = 64


def identity_camera():
    """Camera at the origin looking down +z (world == view frame)."""
    return Camera.create(
        R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.9, width=W, height=H
    )


def ray_dirs(cam):
    """Per-pixel geometry rays and the renderer's depth divisor.

    Two DIFFERENT pixel-center conventions coexist in the reference (and are
    reproduced faithfully here): the projection places the principal point
    at (W-1)/2 (ndc2Pix, auxiliary.h), while the distance->depth divisor ln
    uses W/2 (forward.cu:466). Geometry therefore uses rays through
    (px-(W-1)/2)/fx, and depth_ana divides by the renderer's ln.

    Returns (d_geom (3,H,W) unnormalized, ln_div (H,W))."""
    fx, fy = float(cam.focal_x), float(cam.focal_y)
    px = np.arange(W, dtype=np.float64)
    py = np.arange(H, dtype=np.float64)

    def grid(off):
        nx = (px[None, :] - (W - off) / 2.0) / fx
        ny = (py[:, None] - (H - off) / 2.0) / fy
        return np.stack([np.broadcast_to(nx, (H, W)), np.broadcast_to(ny, (H, W)),
                         np.ones((H, W))], axis=0)

    d = grid(1.0)  # projection convention: principal point (W-1)/2
    ln_div = np.sqrt((grid(0.0) ** 2).sum(axis=0))  # renderer's ln (W/2)
    return d, ln_div


def render_one(cam, xyz, scales, quat, opacity=0.99):
    prep = preprocess_gaussians(
        jnp.asarray([xyz], jnp.float32),
        jnp.asarray([scales], jnp.float32),
        jnp.asarray([quat / np.linalg.norm(quat)], jnp.float32),
        jnp.asarray([[opacity]], jnp.float32),
        jnp.asarray(np.full((1, 1, 3), 0.5), jnp.float32),
        sh_degree=0, camera=cam, kernel_size=0.0,
    )
    return rasterize(prep, cam, jnp.zeros(3), max_per_tile=16,
                     instance_budget=1 << 12, backend="xla")


def test_flat_disk_is_a_plane():
    """A squashed Gaussian at c with in-plane axes -> rendered depth, normal
    and coord must equal the analytic ray/plane intersection."""
    cam = identity_camera()
    d, ln = ray_dirs(cam)

    # plane through c with normal n (tilted relative to the view axis)
    n = np.array([0.3, -0.2, -1.0])
    n /= np.linalg.norm(n)
    c = np.array([0.12, -0.08, 3.0])
    # build a rotation whose third column is n (disk normal)
    a = np.array([1.0, 0.0, 0.0])
    u1 = np.cross(n, a); u1 /= np.linalg.norm(u1)
    u2 = np.cross(n, u1)  # u1 x u2 = n -> det(+1) with columns [u1, u2, n]
    Rm = np.stack([u1, u2, n], axis=1)  # columns: in-plane, in-plane, normal
    # rotation matrix -> quaternion (w, x, y, z)
    tr = np.trace(Rm)
    w = np.sqrt(max(tr + 1, 1e-12)) / 2
    quat = np.array([
        w,
        (Rm[2, 1] - Rm[1, 2]) / (4 * w),
        (Rm[0, 2] - Rm[2, 0]) / (4 * w),
        (Rm[1, 0] - Rm[0, 1]) / (4 * w),
    ])
    s = 0.5
    out = render_one(cam, c, [s, s, 1e-4 * s], quat)

    mask = np.asarray(out["mask"][0])
    # analytic intersection t (ray distance): x = t * d/|d| hits the plane
    # at t = (n.c) |d| / (n.d); the renderer divides the distance by ln
    dn = np.sqrt((d**2).sum(axis=0))
    t_ana = (n @ c) * dn / np.einsum("k,khw->hw", n, d)
    depth_ana = t_ana / ln

    med = np.asarray(out["median_depth"][0])
    exp = np.asarray(out["expected_depth"][0])
    # the per-gaussian t is a linearization around the projected center
    # (forward.cu:596-604), so tolerance widens with distance from it:
    # near-center (high alpha) ~0.3%, the 0.5-alpha envelope ~3%
    near = mask > 0.9
    assert near.sum() > 40, near.sum()
    np.testing.assert_allclose(med[near], depth_ana[near], rtol=5e-3)
    np.testing.assert_allclose(exp[near], depth_ana[near], rtol=5e-3)
    wide = mask > 0.5
    np.testing.assert_allclose(med[wide], depth_ana[wide], rtol=3e-2)
    # the pixel at the projected center: linearization exact there
    cy, cx = np.unravel_index(np.argmax(mask), mask.shape)
    np.testing.assert_allclose(med[cy, cx], depth_ana[cy, cx], rtol=1e-3)

    # normal map: the disk's plane normal (camera-facing) — the analytic
    # normal path (forward.cu:135-262) is EXACT for a flat disk
    nm = np.asarray(out["normal"])  # (3,H,W)
    n_expect = -n if n[2] > 0 else n
    err = np.abs(nm[:, wide] - n_expect[:, None]).max()
    assert err < 1e-5, err

    # coordinate map: the intersection point (t/|d|) * d
    coord = np.asarray(out["expected_coord"])
    coord_ana = (t_ana / dn)[None] * d
    np.testing.assert_allclose(coord[:, near], coord_ana[:, near], atol=1.5e-2)


def test_isotropic_depth_is_projection_onto_ray():
    """Isotropic Gaussian: the max-density point along unit ray u is
    (c.u) u, so rendered (median) depth must be (c.u)/ln = (c.d)/ln^2."""
    cam = identity_camera()
    d, ln = ray_dirs(cam)
    c = np.array([0.2, 0.15, 2.5])
    out = render_one(cam, c, [0.3, 0.3, 0.3], np.array([1.0, 0, 0, 0]))
    mask = np.asarray(out["mask"][0])
    sel = mask > 0.9
    assert sel.sum() > 25, sel.sum()
    dn = np.sqrt((d**2).sum(axis=0))
    t_ana = np.einsum("k,khw->hw", c, d) / dn  # c . u (unit ray)
    depth_ana = t_ana / ln
    med = np.asarray(out["median_depth"][0])
    np.testing.assert_allclose(med[sel], depth_ana[sel], rtol=5e-3)
    exp = np.asarray(out["expected_depth"][0])
    np.testing.assert_allclose(exp[sel], depth_ana[sel], rtol=5e-3)
    wide = mask > 0.5
    np.testing.assert_allclose(med[wide], depth_ana[wide], rtol=3e-2)

    # coord: the foot of the perpendicular from c onto the ray
    coord = np.asarray(out["expected_coord"])
    coord_ana = t_ana[None] * d / dn[None]
    np.testing.assert_allclose(coord[:, sel], coord_ana[:, sel], atol=3e-2)

"""Mesh visibility culling (radegs_tpu/mesh/culling.py) vs closed-form
geometry: the tile-binned depth rasterizer against analytic ray-plane
intersections, then the cull/post-process semantics of
eval_tnt/cull_mesh.py + utils/mesh_utils.py."""

import jax.numpy as jnp
import numpy as np

from radegs_tpu.mesh.culling import (
    cull_mesh,
    keep_largest_component,
    mesh_depth_map,
    point_visibility,
    post_process_mesh,
)

W = H = 64
FX = FY = 100.0
CX = CY = 32.0
CAM = (np.eye(4, dtype=np.float32), FX, FY, CX, CY, W, H)


def _depth(verts, faces, cam=CAM):
    w2c, fx, fy, cx, cy, w, h = cam
    d, ovf = mesh_depth_map(jnp.asarray(verts, jnp.float32),
                            jnp.asarray(faces), jnp.asarray(w2c),
                            fx, fy, cx, cy, width=w, height=h,
                            max_per_tile=64, instance_budget=1 << 14)
    assert int(ovf) == 0
    return np.asarray(d)


def test_flat_triangle_exact_depth():
    # triangle in the z=2 plane, covering pixels around the center
    z = 2.0
    # pixel (u,v) <- x = (u-cx) z / fx
    def xy(u, v):
        return [(u - CX) * z / FX, (v - CY) * z / FY, z]

    verts = np.array([xy(10, 10), xy(54, 10), xy(32, 54)], np.float32)
    faces = np.array([[0, 1, 2]])
    d = _depth(verts, faces)
    assert abs(d[20, 32] - z) < 1e-5  # inside
    assert d[9, 11] == 0.0  # just above the top edge (outside)
    assert d[12, 9] == 0.0  # left of the left edge (outside)
    assert d[2, 2] == 0.0  # far outside
    # filled triangle, apex at v=54: rows narrow as v grows
    assert (d[12] > 0).sum() > (d[40] > 0).sum() > 0


def test_tilted_triangle_perspective_correct():
    # plane z = 2 + 0.5 x: depth at pixel u solves z = 2 + 0.5 * (u-cx) z/fx
    verts = np.array([
        [-0.8, -0.8, 2 - 0.4], [0.8, -0.8, 2 + 0.4],
        [0.8, 0.8, 2 + 0.4], [-0.8, 0.8, 2 - 0.4]], np.float32)
    verts[:, 2] = 2.0 + 0.5 * verts[:, 0]
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    d = _depth(verts, faces)
    for u in (20, 32, 44):
        x_over_z = (u - CX) / FX
        z_true = 2.0 / (1.0 - 0.5 * x_over_z)
        assert abs(d[32, u] - z_true) < 1e-3, (u, d[32, u], z_true)


def test_zbuffer_and_winding():
    def quad(z, s=0.9):
        v = np.array([[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]],
                     np.float32) * [z / 2, z / 2, 1]
        return v, np.array([[0, 1, 2], [0, 2, 3]])

    v1, f1 = quad(2.0)
    v2, f2 = quad(3.0)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    d = _depth(verts, faces)
    assert abs(d[32, 32] - 2.0) < 1e-5  # nearer surface wins
    # flipped winding rasterizes identically (SKIP_CULL_FACES)
    d2 = _depth(verts, faces[:, ::-1])
    np.testing.assert_allclose(d, d2, atol=1e-6)


def test_point_visibility_and_cull():
    # one front quad at z=2 (inside the frustum; u = 32 +- 25); a point
    # behind it is occluded
    s = 0.5
    verts = np.array([[-s, -s, 2], [s, -s, 2], [s, s, 2], [-s, s, 2]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    pts = np.array([
        [0, 0, 2.0],   # on the surface -> seen
        [0, 0, 3.0],   # behind the quad -> occluded
        [0, 0, -1.0],  # behind the camera -> out of frustum
    ], np.float32)
    seen = point_visibility(pts, [CAM], meshes=(jnp.asarray(verts),
                                                jnp.asarray(faces)),
                            min_views=1)
    assert seen.tolist() == [True, False, False]

    # cull: add a small hidden triangle behind the quad; it must disappear
    hidden = np.array([[-0.1, -0.1, 3.0], [0.1, -0.1, 3.0], [0, 0.1, 3.0]],
                      np.float32)
    verts2 = np.concatenate([verts, hidden])
    faces2 = np.concatenate([faces, [[4, 5, 6]]])
    cv, cf = cull_mesh(verts2, faces2, [CAM], min_views=1)
    assert len(cf) == 2 and len(cv) == 4


def test_post_process_and_components():
    # two disconnected patches: 8-triangle strip + 1 floater triangle
    def strip(n, x0):
        v = []
        f = []
        for i in range(n + 1):
            v += [[x0 + i * 0.1, 0, 2], [x0 + i * 0.1, 0.1, 2]]
        for i in range(n):
            a = 2 * i
            f += [[a, a + 1, a + 2], [a + 1, a + 3, a + 2]]
        return np.array(v, np.float32), np.array(f)

    v1, f1 = strip(8, 0.0)
    v2 = np.array([[5, 5, 2], [5.1, 5, 2], [5, 5.1, 2]], np.float32)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, [[len(v1), len(v1) + 1, len(v1) + 2]]])

    pv, pf = post_process_mesh(verts, faces, cluster_to_keep=1000,
                               min_triangles=4)
    assert len(pf) == 16  # floater (1 tri < 4) dropped, strip kept
    assert len(pv) == len(v1)

    lv, lf = keep_largest_component(verts, faces)
    assert len(lf) == 16
    av, af = keep_largest_component(verts, faces, area_fraction=1e-6)
    assert len(af) == 17  # tiny fraction keeps both components

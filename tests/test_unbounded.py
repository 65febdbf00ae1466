"""Unbounded contracted-space extraction (radegs_tpu/mesh/unbounded.py):
contraction math, focus-point solve, and an end-to-end sphere-scene
extraction scored against the analytic surface."""

import jax.numpy as jnp
import numpy as np

from radegs_tpu.core.camera import Camera
from radegs_tpu.mesh.unbounded import (
    contract,
    extract_mesh_unbounded,
    focus_point,
    scene_normalization,
    uncontract,
)
from radegs_tpu.models import gaussian_model as gm

RNG = np.random.default_rng(0)


def test_contract_roundtrip():
    x = RNG.normal(size=(500, 3)) * 3.0
    y = contract(x)
    assert np.linalg.norm(y, axis=-1).max() < 2.0
    np.testing.assert_allclose(uncontract(y), x, rtol=1e-5, atol=1e-5)
    # inside the unit ball the contraction is the identity
    xin = RNG.normal(size=(100, 3)) * 0.3
    np.testing.assert_allclose(contract(xin), xin)


def _orbit(n, r, target, w, h, fov=0.9):
    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = np.asarray(target) + [r * np.cos(th), 0.35 * r, r * np.sin(th)]
        cams.append(Camera.look_at(eye, target, [0, 1, 0], fov, fov, w, h))
    return cams


def test_focus_point_and_normalization():
    target = np.array([0.3, -0.2, 0.5])
    cams = _orbit(6, 3.0, target, 64, 64)
    c2ws = np.stack([np.linalg.inv(np.asarray(c.world_view, np.float64))
                     for c in cams])
    fp = focus_point(c2ws)
    np.testing.assert_allclose(fp, target, atol=1e-5)
    center, radius = scene_normalization(cams)
    np.testing.assert_allclose(center, target, atol=1e-4)
    # orbit distance = sqrt(r^2 + (0.35 r)^2)
    assert abs(radius - 3.0 * np.sqrt(1 + 0.35 ** 2)) < 1e-3


def test_extract_sphere():
    # opaque splats on a unit sphere; the contracted-grid extraction must
    # recover a surface within a few voxels of |x| = 1
    n = 20_000
    d = RNG.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d.astype(np.float32)
    cols = RNG.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, sh_degree=0)
    cams = _orbit(6, 3.0, [0, 0, 0], 128, 128)
    state = gm.update_3d_filter(state, cams)
    state = state.replace(params=state.params.replace(
        opacity=jnp.where(state.active[:, None],
                          gm.inverse_sigmoid(jnp.float32(0.9)),
                          state.params.opacity)))
    views = [(c, None, i) for i, c in enumerate(cams)]
    verts, faces, vcols = extract_mesh_unbounded(
        state, views, kernel_size=0.1, bg=jnp.zeros(3), resolution=128,
        block=32, max_per_tile=512, verbose=False)
    assert len(verts) > 200 and len(faces) > 200
    r = np.linalg.norm(verts, axis=1)
    # camera radius ~ 3.19 -> truncation 5 voxels ~ 0.25 world at res 128;
    # everything must land within the truncation band, most much closer
    assert abs(np.median(r) - 1.0) < 0.08, np.median(r)
    assert (np.abs(r - 1.0) < 0.25).mean() > 0.99
    assert (np.abs(r - 1.0) < 0.15).mean() > 0.9
    assert vcols.shape == (len(verts), 3)
    assert (vcols >= 0).all() and (vcols <= 1).all()

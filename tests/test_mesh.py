"""Mesh extraction: marching tetrahedra unit test + both extractor
pipelines on a synthetic opaque sphere (vertices must land on the shell)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.core.camera import Camera
from radegs_tpu.mesh.tetmesh import marching_tetrahedra
from radegs_tpu.models import gaussian_model as gm


def test_marching_tetrahedra_single_tet():
    """The kaolin docstring example (utils/tetmesh.py:163-180)."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64)
    tets = np.array([[0, 1, 2, 3]])
    sdf = np.array([-1.0, -1.0, 0.5, 0.5])
    ep, es, _, faces = marching_tetrahedra(verts, tets, sdf, np.ones(4))
    assert ep.shape[0] == 4  # 4 crossing edges
    assert faces.shape == (2, 3)
    # linear interpolation reproduces kaolin's expected vertices
    t = np.abs(es[:, 0]) / np.abs(es[:, 0] - es[:, 1])
    pts = ep[:, 0] + t[:, None] * (ep[:, 1] - ep[:, 0])
    expect = {(0.0, 2 / 3, 0.0), (0.0, 0.0, 2 / 3), (1 / 3, 2 / 3, 0.0), (1 / 3, 0.0, 2 / 3)}
    got = {tuple(np.round(p, 4)) for p in pts}
    assert got == {tuple(np.round(np.array(e), 4)) for e in expect}


@pytest.fixture(scope="module")
def sphere_scene():
    rng = np.random.default_rng(0)
    n = 700
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = (dirs * 1.0).astype(np.float32)
    cols = rng.uniform(0.3, 0.8, size=(n, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=gm.round_capacity(n, 1024))
    state = state.replace(
        params=state.params.replace(
            opacity=jnp.where(state.active[:, None], gm.inverse_sigmoid(jnp.float32(0.95)),
                              state.params.opacity),
            scaling=jnp.where(state.active[:, None], jnp.log(jnp.float32(0.09)),
                              state.params.scaling),
        )
    )
    views = []
    for i in range(6):
        ang = 2 * np.pi * i / 6
        cam = Camera.look_at([3.2 * np.sin(ang), 0.4, -3.2 * np.cos(ang)],
                             [0, 0, 0], [0, 1, 0], 0.9, 0.9, 64, 64)
        views.append((cam, None, i))
    return state, views


def test_tsdf_extraction(sphere_scene, tmp_path):
    from radegs_tpu.mesh.tsdf import extract_mesh_tsdf

    state, views = sphere_scene
    out = tmp_path / "recon_tsdf.ply"
    verts, faces = extract_mesh_tsdf(
        state, views, kernel_size=0.1, bg=jnp.zeros(3), voxel_size=0.05,
        out_path=str(out), max_per_tile=256, verbose=False,
    )
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=1)
    # mesh hugs the unit sphere (median depth surface sits slightly outside
    # the centers by ~the splat width)
    assert abs(np.median(r) - 1.0) < 0.2, np.median(r)
    assert out.exists()


def test_tetra_extraction(sphere_scene, tmp_path):
    from radegs_tpu.mesh.extract_tetra import extract_mesh_tetrahedra

    state, views = sphere_scene
    out = tmp_path / "recon_tetra.ply"
    verts, faces = extract_mesh_tetrahedra(
        state, views, kernel_size=0.1, bg=jnp.zeros(3), out_path=str(out),
        n_binary_steps=3, max_per_tile=256, instance_budget=1 << 15,
        verbose=False,
    )
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - 1.0) < 0.2, np.median(r)
    assert out.exists()


def test_decimate_seed_points():
    from radegs_tpu.mesh.extract_tetra import decimate_seed_points

    rng = np.random.default_rng(0)
    # 3 clusters of near-duplicates + 2 isolated points
    # cluster centers at voxel-cell centers (offset 0.005 with voxel 0.01)
    # so the 1e-4 jitter cannot straddle a cell boundary
    base = np.array([[0.005, 0.005, 0.005], [1.005, 0.005, 0.005],
                     [0.005, 1.005, 0.005]], np.float32)
    pts = np.concatenate(
        [np.repeat(base, 50, axis=0) + rng.normal(scale=1e-4, size=(150, 3)).astype(np.float32),
         np.array([[5, 5, 5], [-5, -5, -5]], np.float32)]
    )
    scales = rng.uniform(0.1, 1.0, size=len(pts)).astype(np.float32)
    out, osc = decimate_seed_points(pts, scales, voxel=0.01)
    assert out.shape[0] == 5  # one rep per cluster + the isolated pair
    # representative carries its cell's max scale
    assert abs(osc.max() - scales.max()) < 1e-6 or osc.max() <= scales.max()
    # every representative is an original point
    d = np.abs(out[:, None, :] - pts[None]).sum(-1).min(1)
    assert (d < 1e-7).all()

"""Invariants of the exact reference renderer (the oracle itself)."""

import jax.numpy as jnp
import numpy as np

from radegs_tpu.core.camera import Camera
from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.ops.reference import render_reference


def scene(P=32, seed=5, size=64):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.5
    q = rng.normal(size=(P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    scales = np.exp(rng.normal(size=(P, 3)) * 0.3).astype(np.float32) * 0.15
    opac = rng.uniform(0.4, 0.95, size=(P, 1)).astype(np.float32)
    sh = rng.normal(size=(P, 16, 3)).astype(np.float32) * 0.3
    cam = Camera.look_at([0, 0, -4.0], [0, 0, 0], [0, 1, 0], 0.8, 0.8, size, size)
    prep = preprocess_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(opac), jnp.asarray(sh), 3, cam,
    )
    return prep, cam


def test_renderer_invariants():
    prep, cam = scene()
    bg = jnp.array([1.0, 1.0, 1.0])
    out = render_reference(prep, cam.width, cam.height, cam.focal_x, cam.focal_y, bg)
    alpha = np.asarray(out["alpha"])[0]
    tfin = np.asarray(out["t_final"])[0]
    assert np.all(alpha >= -1e-6) and np.all(alpha <= 1.0 + 1e-5)
    # weight == 1 - final transmittance
    np.testing.assert_allclose(alpha, 1.0 - tfin, atol=1e-5)
    # normals are unit or zero
    n = np.asarray(out["normal"])
    ln = np.linalg.norm(n, axis=0)
    assert np.all((np.abs(ln - 1) < 1e-4) | (ln < 1e-6))
    # median depth is positive where there is coverage
    md = np.asarray(out["median_depth"])[0]
    assert np.all(md[alpha > 0.5] > 0)
    # expected depth within scene range
    ed = np.asarray(out["expected_depth"])[0]
    assert np.all(ed[alpha > 0.5] > 2.0)
    assert np.all(ed[alpha > 0.5] < 6.0)


def test_empty_pixels_show_background():
    prep, cam = scene(P=1)
    bg = jnp.array([0.25, 0.5, 0.75])
    out = render_reference(prep, cam.width, cam.height, cam.focal_x, cam.focal_y, bg)
    img = np.asarray(out["render"])
    alpha = np.asarray(out["alpha"])[0]
    empty = alpha < 1e-6
    assert empty.any()
    for c in range(3):
        np.testing.assert_allclose(img[c][empty], float(bg[c]), atol=1e-5)


def test_single_gaussian_depth_matches_center_distance():
    """A lone isotropic Gaussian: median/expected depth at its projected
    center equals the center's z (distance / ln cancels the ray obliquity)."""
    means = np.array([[0.1, -0.2, 0.0]], np.float32)
    scales = np.full((1, 3), 0.2, np.float32)
    q = np.array([[1, 0, 0, 0]], np.float32)
    opac = np.array([[0.95]], np.float32)
    sh = np.zeros((1, 16, 3), np.float32)
    cam = Camera.look_at([0, 0, -4.0], [0, 0, 0], [0, 1, 0], 0.8, 0.8, 64, 64)
    prep = preprocess_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(opac), jnp.asarray(sh), 3, cam,
    )
    out = render_reference(prep, 64, 64, cam.focal_x, cam.focal_y, jnp.zeros(3))
    xy = np.asarray(prep.xy)[0]
    px, py = int(round(xy[0])), int(round(xy[1]))
    md = float(np.asarray(out["median_depth"])[0, py, px])
    z = float(np.asarray(prep.depth)[0])
    # md is distance/ln == depth for the center ray (approximately, due to
    # sub-pixel offset between the center and the pixel grid)
    np.testing.assert_allclose(md, z, rtol=5e-3)
    # coordinate map at the center ~ view-space position (the pixel grid sits
    # up to 0.5px from the true center; camera_plane slope is ~z/fx per px)
    mc = np.asarray(out["median_coord"])[:, py, px]
    np.testing.assert_allclose(mc, np.asarray(prep.view_point)[0], atol=5e-2)

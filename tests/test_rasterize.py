"""Fast tile rasterizer vs the exact reference renderer: outputs AND gradients.

The reference renderer (ops.reference) is pure jnp, so jax.grad through it is
an *autodiff oracle* for our hand-written custom VJP — the analogue of the
finite-difference checks SURVEY.md §4 prescribes for backward.cu, but exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.core.camera import Camera
from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.ops.rasterize import rasterize
from radegs_tpu.ops.reference import render_reference


def make_scene(P=48, seed=9, size=64, opac_hi=0.95):
    rng = np.random.default_rng(seed)
    means = (rng.normal(size=(P, 3)) * 0.5).astype(np.float32)
    q = rng.normal(size=(P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    scales = (np.exp(rng.normal(size=(P, 3)) * 0.4) * 0.12).astype(np.float32)
    opac = rng.uniform(0.3, opac_hi, size=(P, 1)).astype(np.float32)
    sh = (rng.normal(size=(P, 16, 3)) * 0.3).astype(np.float32)
    cam = Camera.look_at([0.3, -0.2, -3.5], [0, 0, 0], [0, 1, 0], 0.9, 0.9, size, size)
    return means, scales, q, opac, sh, cam


def both_renders(means, scales, q, opac, sh, cam, bg):
    prep = preprocess_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(opac), jnp.asarray(sh), 3, cam,
    )
    ref = render_reference(prep, cam.width, cam.height, cam.focal_x, cam.focal_y, bg)
    fast = rasterize(prep, cam, bg, max_per_tile=64, instance_budget=1 << 13)
    return ref, fast


@pytest.mark.parametrize("bgc", [0.0, 1.0])
def test_forward_matches_reference(bgc):
    means, scales, q, opac, sh, cam = make_scene()
    bg = jnp.full((3,), bgc)
    ref, fast = both_renders(means, scales, q, opac, sh, cam, bg)
    assert int(fast["binning"].n_overflow) == 0
    assert int(fast["binning"].tile_overflow) == 0
    np.testing.assert_allclose(fast["render"], ref["render"], atol=2e-5)
    np.testing.assert_allclose(fast["mask"], ref["alpha"], atol=2e-5)
    np.testing.assert_allclose(fast["expected_depth"], ref["expected_depth"], atol=1e-4)
    np.testing.assert_allclose(fast["median_depth"], ref["median_depth"], atol=1e-4)
    np.testing.assert_allclose(fast["expected_coord"], ref["expected_coord"], atol=1e-4)
    np.testing.assert_allclose(fast["median_coord"], ref["median_coord"], atol=1e-4)
    np.testing.assert_allclose(fast["normal"], ref["normal"], atol=1e-4)


def test_forward_with_saturation_and_termination():
    # near-opaque gaussians force the early-termination path (T < 1e-4)
    means, scales, q, opac, sh, cam = make_scene(P=64, seed=21, opac_hi=0.999)
    opac[:] = 0.99
    bg = jnp.array([0.2, 0.4, 0.6])
    ref, fast = both_renders(means, scales, q, opac, sh, cam, bg)
    np.testing.assert_allclose(fast["render"], ref["render"], atol=2e-5)
    np.testing.assert_allclose(fast["median_depth"], ref["median_depth"], atol=1e-4)
    np.testing.assert_allclose(fast["mask"], ref["alpha"], atol=2e-5)


def _loss_weights(shape_dict, seed=3):
    rng = np.random.default_rng(seed)
    return {k: jnp.asarray(rng.normal(size=v).astype(np.float32)) for k, v in shape_dict.items()}


def test_custom_vjp_matches_autodiff_oracle():
    means, scales, q, opac, sh, cam = make_scene(P=24, size=48)
    bg = jnp.array([0.3, 0.3, 0.3])
    H = W = 48
    lw = _loss_weights(
        {
            "render": (3, H, W),
            "alpha": (1, H, W),
            "expected_depth": (1, H, W),
            "median_depth": (1, H, W),
            "expected_coord": (3, H, W),
            "median_coord": (3, H, W),
            "normal": (3, H, W),
        }
    )

    def loss_ref(m, s, qq, o, c):
        prep = preprocess_gaussians(m, s, qq, o, c, 3, cam)
        out = render_reference(prep, cam.width, cam.height, cam.focal_x, cam.focal_y, bg)
        return (
            jnp.vdot(lw["render"], out["render"])
            + jnp.vdot(lw["alpha"], out["alpha"])
            + jnp.vdot(lw["expected_depth"], out["expected_depth"])
            + jnp.vdot(lw["median_depth"], out["median_depth"])
            + jnp.vdot(lw["expected_coord"], out["expected_coord"])
            + jnp.vdot(lw["median_coord"], out["median_coord"])
            + jnp.vdot(lw["normal"], out["normal"])
        )

    def loss_fast(m, s, qq, o, c):
        prep = preprocess_gaussians(m, s, qq, o, c, 3, cam)
        out = rasterize(prep, cam, bg, max_per_tile=64, instance_budget=1 << 12)
        return (
            jnp.vdot(lw["render"], out["render"])
            + jnp.vdot(lw["alpha"], out["mask"])
            + jnp.vdot(lw["expected_depth"], out["expected_depth"])
            + jnp.vdot(lw["median_depth"], out["median_depth"])
            + jnp.vdot(lw["expected_coord"], out["expected_coord"])
            + jnp.vdot(lw["median_coord"], out["median_coord"])
            + jnp.vdot(lw["normal"], out["normal"])
        )

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(sh))
    v_ref = float(loss_ref(*args))
    v_fast = float(loss_fast(*args))
    np.testing.assert_allclose(v_fast, v_ref, rtol=1e-4)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "quats", "opacity", "sh"]
    for n, a, b in zip(names, g_fast, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), n
        scale = np.maximum(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=2e-3 * scale, rtol=2e-3, err_msg=n)


def test_absgrad_side_channel():
    means, scales, q, opac, sh, cam = make_scene(P=16, size=32)
    bg = jnp.zeros(3)
    gt = jnp.asarray(np.random.default_rng(1).uniform(size=(3, 32, 32)).astype(np.float32))

    def loss(xy_abs):
        prep = preprocess_gaussians(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(opac), jnp.asarray(sh), 3, cam,
        )
        out = rasterize(prep, cam, bg, max_per_tile=64, instance_budget=1 << 12,
                        xy_abs=xy_abs)
        return jnp.sum(jnp.abs(out["render"] - gt))

    absg = jax.grad(loss)(jnp.zeros((len(means), 2)))
    absg = np.asarray(absg)
    assert np.all(absg[:, 0] >= 0)  # absolute values
    assert absg[:, 0].max() > 0  # something rendered
    np.testing.assert_array_equal(absg[:, 1], 0)

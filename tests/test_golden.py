"""Golden regression: render outputs of a fixed synthetic scene against a
committed fixture. Catches unintended numerical drift in the full pipeline
(preprocess -> binning -> blend -> normalization). Regenerate deliberately
with REGEN_GOLDEN=1 python -m pytest tests/test_golden.py."""

import os

import jax.numpy as jnp
import numpy as np

from radegs_tpu.core.camera import Camera
from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.renderer import render

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_render.npz")


def build():
    rng = np.random.default_rng(42)
    P = 90
    state = gm.create_from_points(
        (rng.normal(size=(P, 3)) * 0.6).astype(np.float32),
        rng.uniform(0.1, 0.9, size=(P, 3)).astype(np.float32),
        capacity=128,
    )
    state = state.replace(
        params=state.params.replace(
            f_rest=jnp.asarray(rng.normal(size=state.params.f_rest.shape) * 0.05,
                               jnp.float32),
            opacity=jnp.where(state.active[:, None], gm.inverse_sigmoid(jnp.float32(0.7)),
                              state.params.opacity),
            scaling=state.params.scaling + 0.5,
            rotation=jnp.asarray(rng.normal(size=(128, 4)), jnp.float32),
        ),
        active_sh_degree=jnp.asarray(3, jnp.int32),
    )
    cam = Camera.look_at([0.4, 0.6, -3.6], [0, 0, 0], [0, 1, 0], 0.9, 0.8, 80, 64)
    state = gm.update_3d_filter(state, [cam])
    out = render(state, cam, jnp.asarray([0.1, 0.2, 0.3]), kernel_size=0.1,
                 max_per_tile=128, instance_budget=1 << 12)
    keys = ["render", "mask", "expected_depth", "median_depth", "expected_coord",
            "median_coord", "normal"]
    return {k: np.asarray(out[k]) for k in keys}


def test_golden_render():
    got = build()
    if os.environ.get("REGEN_GOLDEN") or not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **got)
        assert os.path.exists(FIXTURE)
        return
    ref = np.load(FIXTURE)
    for k in got:
        np.testing.assert_allclose(
            got[k], ref[k], atol=5e-5, rtol=1e-4,
            err_msg=f"golden drift in {k}",
        )

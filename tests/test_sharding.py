"""Multi-chip sharding: the full train step compiles and runs over an
8-device (g, t) mesh (conftest forces 8 virtual CPU devices), and the
sharded result matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.core.camera import Camera
from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.parallel.sharding import make_mesh, shard_camera, shard_train_state
from radegs_tpu.renderer import mark_visible
from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig
from radegs_tpu.train.loop import init_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    P = 48
    state = gm.create_from_points(
        (rng.normal(size=(P, 3)) * 0.5).astype(np.float32),
        rng.uniform(0.2, 0.9, size=(P, 3)).astype(np.float32),
        capacity=256,
    )
    cam = Camera.look_at([0, 0.5, -3.5], [0, 0, 0], [0, 1, 0], 0.9, 0.9, 32, 32)
    state = gm.update_3d_filter(state, [cam])
    gt = jnp.clip(jnp.asarray(rng.uniform(size=(3, 32, 32)), jnp.float32), 0, 1)
    return state, cam, gt


def _one_step(ts, cam, gt, mesh=None):
    bg = jnp.zeros(3)
    step = make_train_step(
        ModelConfig(kernel_size=0.1), OptimizationConfig(regularization_from_iter=0),
        PipelineConfig(max_per_tile=64), spatial_lr_scale=3.5,
    )
    if mesh is not None:
        with mesh:
            ts, m = step(ts, cam, gt, bg, 0, 32, 32)
    else:
        ts, m = step(ts, cam, gt, bg, 0, 32, 32)
    return ts, {k: float(v) for k, v in m.items()}


def test_sharded_step_matches_single_device(setup):
    state, cam, gt = setup
    assert len(jax.devices()) == 8

    copy = lambda s: jax.tree.map(jnp.copy, s)  # the train step donates its input
    ts0 = init_train_state(copy(state), jax.random.PRNGKey(0))
    ts_ref, m_ref = _one_step(ts0, cam, gt)

    mesh = make_mesh(jax.devices(), tile_parallel=2)
    ts1 = init_train_state(copy(state), jax.random.PRNGKey(0))
    ts1 = shard_train_state(ts1, mesh)
    cam_s = shard_camera(cam, mesh)
    ts_sh, m_sh = _one_step(ts1, cam_s, gt, mesh)

    assert np.isfinite(m_sh["loss"])
    assert abs(m_sh["loss"] - m_ref["loss"]) < 1e-5
    np.testing.assert_allclose(
        np.asarray(ts_sh.gaussians.params.xyz), np.asarray(ts_ref.gaussians.params.xyz),
        atol=1e-5,
    )


def test_mark_visible(setup):
    state, cam, _ = setup
    vis = np.asarray(mark_visible(state, cam))
    act = np.asarray(state.active)
    assert vis.shape == act.shape
    assert vis[act].sum() > 0
    assert not vis[~act].any()

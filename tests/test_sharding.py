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


def test_visibility_compressed_step_matches_single_device(setup):
    """parallel/step.py: the explicit shard_map step (visibility-compressed
    all-gather + tile-band rasterization + halo losses) must reproduce the
    single-device train step to float tolerance."""
    from radegs_tpu.parallel.step import (
        band_layout,
        make_mesh_1d,
        make_sharded_train_step,
        pad_gt,
    )

    state, cam, gt = setup
    copy = lambda s: jax.tree.map(jnp.copy, s)

    ts0 = init_train_state(copy(state), jax.random.PRNGKey(0))
    ts_ref, m_ref = _one_step(ts0, cam, gt)

    mesh = make_mesh_1d(jax.devices())
    mcfg = ModelConfig(kernel_size=0.1)
    ocfg = OptimizationConfig(regularization_from_iter=0)
    pcfg = PipelineConfig(max_per_tile=64)
    step = make_sharded_train_step(
        mcfg, ocfg, pcfg, spatial_lr_scale=3.5, mesh=mesh,
        width=cam.width, height=cam.height,
    )
    _, _, H_pad = band_layout(cam.height, len(jax.devices()))
    gt_p = pad_gt(gt, H_pad)
    ts1 = init_train_state(copy(state), jax.random.PRNGKey(0))
    with mesh:
        ts_sh, m_sh = step(ts1, cam, gt_p, jnp.zeros(3))
    m_sh = {k: float(v) for k, v in m_sh.items()}

    assert np.isfinite(m_sh["loss"])
    assert m_sh["n_vis_overflow"] == 0
    assert abs(m_sh["loss"] - m_ref["loss"]) < 1e-5, (m_sh["loss"], m_ref["loss"])
    assert abs(m_sh["psnr"] - m_ref["psnr"]) < 1e-3
    np.testing.assert_allclose(
        np.asarray(ts_sh.gaussians.params.xyz), np.asarray(ts_ref.gaussians.params.xyz),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ts_sh.gaussians.grad_accum), np.asarray(ts_ref.gaussians.grad_accum),
        atol=1e-4,
    )


def test_visibility_compression_overflow_reported(setup):
    """A starved vis_capacity must be reported, never silent."""
    from radegs_tpu.parallel.step import (
        band_layout,
        make_mesh_1d,
        make_sharded_train_step,
        pad_gt,
    )

    state, cam, gt = setup
    ts = init_train_state(jax.tree.map(jnp.copy, state), jax.random.PRNGKey(0))
    mesh = make_mesh_1d(jax.devices())
    step = make_sharded_train_step(
        ModelConfig(kernel_size=0.1), OptimizationConfig(regularization_from_iter=0),
        PipelineConfig(max_per_tile=64), spatial_lr_scale=3.5, mesh=mesh,
        width=cam.width, height=cam.height, vis_capacity=2,
    )
    _, _, H_pad = band_layout(cam.height, len(jax.devices()))
    with mesh:
        _, m = step(ts, cam, pad_gt(gt, H_pad), jnp.zeros(3))
    assert float(m["n_vis_overflow"]) > 0
    assert np.isfinite(float(m["loss"]))


def test_train_loop_with_mesh(setup):
    """train(mesh=...) drives the sharded step end-to-end for a few
    iterations (schedule, metrics fetch, overflow checks)."""
    from radegs_tpu.parallel.step import make_mesh_1d
    from radegs_tpu.train.loop import SceneLike, train

    state, cam, gt = setup
    mesh = make_mesh_1d(jax.devices())
    ts, history = train(
        SceneLike(cameras=[(cam, gt, 0)], extent=3.5),
        jax.tree.map(jnp.copy, state),
        ModelConfig(kernel_size=0.1),
        OptimizationConfig(iterations=3, regularization_from_iter=0),
        PipelineConfig(max_per_tile=64),
        log_every=1,
        mesh=mesh,
    )
    assert len(history) == 3
    assert np.isfinite(history[-1]["loss"])


def test_train_loop_with_mesh_densify(setup):
    """VERDICT r2 #6: the mesh-path loop must survive and match the
    single-device loop THROUGH densification (clone/split/prune fire on
    shard_map-output-sharded state via the plain-jit densify_step +
    update_3d_filter + maybe_grow host sequence)."""
    from radegs_tpu.parallel.step import make_mesh_1d
    from radegs_tpu.train.loop import SceneLike, train

    state, cam, gt = setup
    scene = SceneLike(cameras=[(cam, gt, 0)], extent=3.5)
    mcfg = ModelConfig(kernel_size=0.1)
    # schedule chosen so densify fires twice (iters 4, 6) and the grad
    # threshold is tiny so clone/split both trigger; prune fires via the
    # min-opacity path on the 0.1-opacity init
    ocfg = OptimizationConfig(
        iterations=8, regularization_from_iter=0, densify_from_iter=2,
        densification_interval=2, densify_until_iter=10,
        densify_grad_threshold=1e-7, opacity_reset_interval=1000,
    )
    pcfg = PipelineConfig(max_per_tile=64)

    ts_ref, hist_ref = train(
        scene, jax.tree.map(jnp.copy, state), mcfg, ocfg, pcfg, log_every=1)
    n_ref = int(ts_ref.gaussians.n_active())
    n0 = int(state.n_active())
    assert n_ref != n0, "densify/prune never changed the particle count"

    mesh = make_mesh_1d(jax.devices())
    ts_sh, hist_sh = train(
        scene, jax.tree.map(jnp.copy, state), mcfg, ocfg, pcfg, log_every=1,
        mesh=mesh)

    assert int(ts_sh.gaussians.n_active()) == n_ref
    assert abs(hist_sh[-1]["loss"] - hist_ref[-1]["loss"]) < 1e-4
    # same particles in the same order (the compaction argsort is
    # deterministic and the densify PRNG chain is seed-identical); atol
    # covers fp reduction-order drift between the halo-banded sharded loss
    # and the single-device loss accumulated over the 8 iterations
    np.testing.assert_allclose(
        np.asarray(ts_sh.gaussians.params.xyz),
        np.asarray(ts_ref.gaussians.params.xyz), atol=2e-3,
    )


def test_mark_visible(setup):
    state, cam, _ = setup
    vis = np.asarray(mark_visible(state, cam))
    act = np.asarray(state.active)
    assert vis.shape == act.shape
    assert vis[act].sum() > 0
    assert not vis[~act].any()


def test_sharded_step_with_appearance(setup):
    """Decoupled appearance in the sharded step: must match the
    single-device appearance step (the CNN runs replicated on the gathered
    image; its term is counted once via the 1/n split)."""
    from radegs_tpu.parallel.step import (
        band_layout,
        make_mesh_1d,
        make_sharded_train_step,
        pad_gt,
    )

    state, cam, gt = setup
    copy = lambda s: jax.tree.map(jnp.copy, s)
    mcfg = ModelConfig(kernel_size=0.1, use_decoupled_appearance=True)
    ocfg = OptimizationConfig(regularization_from_iter=0)
    pcfg = PipelineConfig(max_per_tile=64)

    ts0 = init_train_state(copy(state), jax.random.PRNGKey(0), cam.height,
                           cam.width, use_appearance=True)
    ref_step = make_train_step(mcfg, ocfg, pcfg, spatial_lr_scale=3.5)
    ts_ref, m_ref = ref_step(jax.tree.map(jnp.copy, ts0), cam, gt,
                             jnp.zeros(3), 0, cam.width, cam.height)

    mesh = make_mesh_1d(jax.devices())
    step = make_sharded_train_step(
        mcfg, ocfg, pcfg, spatial_lr_scale=3.5, mesh=mesh,
        width=cam.width, height=cam.height,
    )
    _, _, H_pad = band_layout(cam.height, len(jax.devices()))
    with mesh:
        ts_sh, m_sh = step(jax.tree.map(jnp.copy, ts0), cam,
                           pad_gt(gt, H_pad), jnp.zeros(3), 0)

    assert abs(float(m_sh["loss"]) - float(m_ref["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(ts_sh.gaussians.params.xyz),
        np.asarray(ts_ref.gaussians.params.xyz), atol=1e-5,
    )
    # appearance params updated identically
    for a, b in zip(jax.tree.leaves(ts_sh.app_params),
                    jax.tree.leaves(ts_ref.app_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rebalance_roundtrip_and_balance():
    """parallel/rebalance: strided redistribution is a bijection and spreads
    a front-packed active prefix evenly across shard blocks."""
    from radegs_tpu.parallel.rebalance import to_canonical, to_strided

    rng = np.random.default_rng(0)
    P, cap, n = 100, 256, 8
    state = gm.create_from_points(
        rng.normal(size=(P, 3)).astype(np.float32),
        rng.uniform(size=(P, 3)).astype(np.float32), capacity=cap)

    st = to_strided(state, n)
    # balanced: every Cn-block holds ceil/floor(P/n) actives
    blocks = np.asarray(st.active).reshape(n, cap // n).sum(axis=1)
    assert blocks.max() - blocks.min() <= 1, blocks
    # canonical layout is front-packed by construction: one block holds all
    front = np.asarray(state.active).reshape(n, cap // n).sum(axis=1)
    assert front.max() == cap // n

    back = to_canonical(st, n)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_autotune_vis_capacity_policy():
    """Gather-cap autotune: shrink toward the measured worst-shard peak,
    grow back on overflow, clamp to the per-shard capacity."""
    from radegs_tpu.train.config import PipelineConfig
    from radegs_tpu.train.loop import autotune_pipeline

    cap = 1 << 17  # per-shard capacity

    # lossless start + small measured peak -> shrink to pow2(peak*1.5)
    p = PipelineConfig()
    p2, changed = autotune_pipeline(p, 0, 0, 1000, cap * 8, shrink_check=True,
                                    vis_ovf=0, vis_peak=20_000,
                                    per_shard_cap=cap)
    assert changed and p2.vis_capacity == 1 << 15  # 30000 -> 32768

    # overflow grows (at least doubling), clamped at per-shard capacity
    p3, changed = autotune_pipeline(p2, 0, 0, 1000, cap * 8,
                                    shrink_check=False, vis_ovf=5000,
                                    vis_peak=40_000, per_shard_cap=cap)
    assert changed and p3.vis_capacity == 1 << 16
    p4, changed = autotune_pipeline(p3, 0, 0, 1000, cap * 8,
                                    shrink_check=False, vis_ovf=999_999,
                                    vis_peak=float(cap * 2),
                                    per_shard_cap=cap)
    assert changed and p4.vis_capacity == cap
    # at the cap, overflow can't grow further -> no flap
    p5, changed = autotune_pipeline(p4, 0, 0, 1000, cap * 8,
                                    shrink_check=False, vis_ovf=10,
                                    vis_peak=float(cap), per_shard_cap=cap)
    assert not changed

    # single-device path (per_shard_cap=0): vis knob untouched (the
    # instance-budget autotune may still fire — that's its own policy)
    p6, _ = autotune_pipeline(PipelineConfig(), 0, 0, 1000, cap,
                              shrink_check=True, vis_ovf=0,
                              vis_peak=100, per_shard_cap=0)
    assert p6.vis_capacity == 0


def test_autotune_instance_budget_policy():
    """Budget autotune: overflow grows by >=1.5x toward the peak-derived
    bucket; shrink needs a full segment AND >=15% slack; cap respected."""
    from radegs_tpu.ops.binning import BUDGET_SEG, MAX_INSTANCE_BUDGET
    from radegs_tpu.train.config import PipelineConfig
    from radegs_tpu.train.loop import autotune_pipeline

    seg = BUDGET_SEG
    # overflow at 8M budget, peak demand 10.5M -> >= max(6 segs, 1.5x)
    p = PipelineConfig(instance_budget=4 * seg)
    p2, ch = autotune_pipeline(p, n_ovf=1e5, t_ovf=0, window_peak=10_500_000,
                               capacity=1 << 21, shrink_check=False)
    assert ch and p2.instance_budget == 7 * seg  # round_budget(10.5M*1.3)

    # tiny peak: shrink fires only on the shrink_check tick
    p3, ch = autotune_pipeline(p2, 0, 0, window_peak=1_000_000,
                               capacity=1 << 21, shrink_check=False)
    assert not ch
    p4, ch = autotune_pipeline(p2, 0, 0, window_peak=1_000_000,
                               capacity=1 << 21, shrink_check=True)
    assert ch and p4.instance_budget == round(2 ** 21)  # pow2 below a segment

    # peak just under budget: no flap (needs >= max(1 seg, 15%) slack)
    p5, ch = autotune_pipeline(p2, 0, 0, window_peak=5 * seg,
                               capacity=1 << 21, shrink_check=True)
    assert not ch

    # at the cap, overflow only warns
    p6 = PipelineConfig(instance_budget=MAX_INSTANCE_BUDGET)
    p7, ch = autotune_pipeline(p6, n_ovf=1e6, t_ovf=0,
                               window_peak=float(MAX_INSTANCE_BUDGET * 2),
                               capacity=1 << 22, shrink_check=False)
    assert not ch

"""End-to-end training smoke test: the full loop (render -> loss -> custom
VJP -> Adam -> densify/reset schedule) on a tiny synthetic scene must reduce
the loss and keep every array finite."""

import jax
import jax.numpy as jnp
import numpy as np

from radegs_tpu.core.camera import Camera
from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.ops.ssim import psnr
from radegs_tpu.renderer import render
from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig
from radegs_tpu.train.loop import SceneLike, train


def synthetic_scene(n_cams=3, size=48, P=60, seed=0):
    """Ground truth = a render of a random 'target' gaussian set."""
    rng = np.random.default_rng(seed)
    pts = (rng.normal(size=(P, 3)) * 0.5).astype(np.float32)
    cols = rng.uniform(0.2, 0.9, size=(P, 3)).astype(np.float32)
    target = gm.create_from_points(pts, cols, capacity=gm.round_capacity(P, 64))
    # make the target opaque-ish and slightly larger
    target = target.replace(
        params=target.params.replace(
            opacity=jnp.where(target.active[:, None], gm.inverse_sigmoid(jnp.float32(0.8)),
                              target.params.opacity),
            scaling=target.params.scaling + 0.7,
        )
    )
    cams = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        eye = [3.5 * np.sin(ang), 0.5, -3.5 * np.cos(ang)]
        cam = Camera.look_at(eye, [0, 0, 0], [0, 1, 0], 0.9, 0.9, size, size)
        gt = render(target, cam, jnp.zeros(3), max_per_tile=64, instance_budget=1 << 12)[
            "render"
        ]
        cams.append((cam, jnp.clip(gt, 0.0, 1.0), i))
    return cams


def test_training_improves_psnr():
    cams = synthetic_scene()
    rng = np.random.default_rng(7)
    P0 = 50
    init_pts = (rng.normal(size=(P0, 3)) * 0.5).astype(np.float32)
    init_cols = rng.uniform(size=(P0, 3)).astype(np.float32)
    g = gm.create_from_points(init_pts, init_cols, capacity=64)

    mcfg = ModelConfig(kernel_size=0.1)
    ocfg = OptimizationConfig(
        iterations=120,
        densify_from_iter=30,
        densification_interval=40,
        densify_until_iter=100,
        opacity_reset_interval=10_000,  # never, in this short run
        regularization_from_iter=60,
        position_lr_init=0.005,
        position_lr_final=0.0005,
        position_lr_max_steps=120,
    )
    pcfg = PipelineConfig(max_per_tile=64)
    scene = SceneLike(cameras=cams, extent=3.5)

    ts, history = train(scene, g, mcfg, ocfg, pcfg, log_every=20)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, losses
    # densification happened and capacity bookkeeping is consistent
    n_act = history[-1]["n_active"]
    assert 1 <= n_act <= ts.gaussians.capacity
    # rendering from the trained state is finite and in range
    cam, gt, _ = cams[0]
    out = render(ts.gaussians, cam, jnp.zeros(3), max_per_tile=64, instance_budget=1 << 12)
    img = np.asarray(out["render"])
    assert np.all(np.isfinite(img))
    assert float(psnr(jnp.clip(out["render"], 0, 1), gt)) > 10.0


def test_training_with_appearance_and_coord_map():
    cams = synthetic_scene(n_cams=2, size=64)
    rng = np.random.default_rng(8)
    g = gm.create_from_points(
        (rng.normal(size=(40, 3)) * 0.5).astype(np.float32),
        rng.uniform(size=(40, 3)).astype(np.float32),
        capacity=64,
    )
    mcfg = ModelConfig(use_decoupled_appearance=True, use_coord_map=True)
    ocfg = OptimizationConfig(
        iterations=8, densify_from_iter=100, regularization_from_iter=4,
    )
    scene = SceneLike(cameras=cams, extent=3.5)
    ts, history = train(scene, g, mcfg, ocfg, PipelineConfig(max_per_tile=64), log_every=4)
    assert all(np.isfinite(h["loss"]) for h in history)
    assert ts.app_params is not None
    # appearance embeddings actually received gradient updates
    emb = np.asarray(ts.app_params["embeddings"])
    assert np.abs(emb[:2]).max() > 0

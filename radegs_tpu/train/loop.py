"""The training loop — TPU-native re-design of train.py:61-214.

Structure: one jitted ``train_step`` (render -> loss -> grads -> Adam ->
stat accumulation) whose graph is fixed across iterations: iteration-gated
behaviors (SH degree warmup, regularization kick-in) are traced scalars, so
XLA compiles once per (image size, capacity). Densify/prune/opacity-reset
run as separately-jitted functions on the schedule the reference uses
(train.py:184-204); capacity growth is the only host-side recompile trigger.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from radegs_tpu.core.geometry import depth_double_to_normal, point_double_to_normal
from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.models.appearance import AppearanceNetwork, appearance_transform, init_appearance
from radegs_tpu.ops.ssim import l1_loss, ssim
from radegs_tpu.renderer import render
from radegs_tpu.train.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    replace as replace_cfg,
)
from radegs_tpu.train.optim import BETA1, BETA2, EPS, GroupLRs, adam_step, expon_lr


# HBM guard for the auto-growing instance budget (16M instances ~ several GB
# of flat per-instance state in the backward pass); single source of truth
# in ops/binning.py (also the f32-exact slot bound there)
from radegs_tpu.ops.binning import MAX_INSTANCE_BUDGET  # noqa: E402


@struct.dataclass
class TrainState:
    gaussians: gm.GaussianState
    app_params: Any  # {"net": ..., "embeddings": ...} or None
    app_m: Any
    app_v: Any
    iteration: Any  # () int32
    key: Any  # PRNG


def init_train_state(gaussians, key, height=0, width=0, use_appearance=False):
    if use_appearance:
        key, sub = jax.random.split(key)
        _, app_params = init_appearance(sub, height, width)
        app_m = jax.tree.map(jnp.zeros_like, app_params)
        app_v = jax.tree.map(jnp.zeros_like, app_params)
    else:
        app_params = app_m = app_v = None
    return TrainState(
        gaussians=gaussians,
        app_params=app_params,
        app_m=app_m,
        app_v=app_v,
        iteration=jnp.zeros((), jnp.int32),
        key=key,
    )


def compute_loss(
    gaussians: gm.GaussianState,
    app_params,
    xy_offset,
    xy_abs,
    camera,
    gt_image,
    bg,
    iteration,
    mcfg: ModelConfig,
    ocfg: OptimizationConfig,
    pcfg: PipelineConfig,
    view_idx=0,
):
    """Loss of train.py:124-162. Returns (loss, aux)."""
    from radegs_tpu.ops.binning import default_instance_budget

    out = render(
        gaussians,
        camera,
        bg,
        kernel_size=mcfg.kernel_size,
        max_per_tile=pcfg.max_per_tile,
        instance_budget=pcfg.instance_budget or min(
            default_instance_budget(gaussians.capacity, pcfg.instance_multiplier),
            MAX_INSTANCE_BUDGET,
        ),
        xy_offset=xy_offset,
        xy_abs=xy_abs,
    )
    image = out["render"]

    if mcfg.use_decoupled_appearance and app_params is not None:
        net = AppearanceNetwork()
        transformed, (top, left, Hc, Wc) = appearance_transform(net, app_params, image, view_idx)
        gt_crop = jax.lax.dynamic_slice(gt_image, (0, top, left), (3, Hc, Wc))
        ll1 = l1_loss(transformed, gt_crop)
    else:
        ll1 = l1_loss(image, gt_image)

    # normal-consistency regularization (train.py:141-155)
    reg_on = (iteration >= ocfg.regularization_from_iter).astype(jnp.float32)
    if mcfg.use_coord_map:
        ref_normals = point_double_to_normal(camera, out["expected_coord"], out["median_coord"])
    else:
        ref_normals = depth_double_to_normal(
            camera, out["expected_depth"], out["median_depth"]
        )
    err = 1.0 - jnp.sum(out["normal"][None] * ref_normals, axis=1)  # (2,H,W)
    depth_ratio = 0.6
    dn_loss = (1 - depth_ratio) * jnp.mean(err[0]) + depth_ratio * jnp.mean(err[1])

    rgb_loss = (1.0 - ocfg.lambda_dssim) * ll1 + ocfg.lambda_dssim * (1.0 - ssim(image, gt_image))
    loss = rgb_loss + reg_on * ocfg.lambda_depth_normal * dn_loss

    aux = {
        "loss": loss,
        "l1": ll1,
        "depth_normal_loss": dn_loss,
        "radii": out["radii"],
        "visibility": out["visibility_filter"],
        "psnr": -10.0 * jnp.log10(jnp.mean((image - gt_image) ** 2)),
        "n_overflow": out["binning"].n_overflow,
        "n_instances": out["binning"].n_instances,
        "tile_overflow": out["binning"].tile_overflow,
    }
    return loss, aux


def make_train_step(mcfg: ModelConfig, ocfg: OptimizationConfig, pcfg: PipelineConfig,
                    spatial_lr_scale: float):
    """Builds the jitted train step. Cameras must share (W, H) per compile."""

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("width", "height"))
    def train_step(ts: TrainState, camera, gt_image, bg, view_idx, width, height):
        g = ts.gaussians
        it = ts.iteration + 1
        C = g.capacity
        zeros2 = jnp.zeros((C, 2), jnp.float32)

        diff_args = (g.params, ts.app_params, zeros2, zeros2)

        def loss_fn(params, app_params, xy_offset, xy_abs):
            gg = g.replace(params=params)
            return compute_loss(
                gg, app_params, xy_offset, xy_abs, camera, gt_image, bg, it,
                mcfg, ocfg, pcfg, view_idx,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
            *diff_args
        )
        g_params, g_app, g_xy, g_xyabs = grads

        # Adam on the gaussian groups with the exp-decayed xyz LR
        # (gaussian_model.py:338-361)
        xyz_lr = expon_lr(
            it.astype(jnp.float32),
            ocfg.position_lr_init * spatial_lr_scale,
            ocfg.position_lr_final * spatial_lr_scale,
            ocfg.position_lr_max_steps,
            lr_delay_mult=ocfg.position_lr_delay_mult,
        )
        lrs = GroupLRs(
            xyz=xyz_lr,
            f_dc=ocfg.feature_lr,
            f_rest=ocfg.feature_lr / 20.0,
            opacity=ocfg.opacity_lr,
            scaling=ocfg.scaling_lr,
            rotation=ocfg.rotation_lr,
        )
        g = adam_step(g, g_params, lrs)

        # appearance Adam (shared step count)
        app_params, app_m, app_v = ts.app_params, ts.app_m, ts.app_v
        if app_params is not None:
            bc1 = 1.0 - BETA1 ** it.astype(jnp.float32)
            bc2 = 1.0 - BETA2 ** it.astype(jnp.float32)

            def upd(p, gg, m, v, lr):
                m = BETA1 * m + (1 - BETA1) * gg
                v = BETA2 * v + (1 - BETA2) * gg * gg
                return p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + EPS), m, v

            lr_tree = {
                "net": jax.tree.map(
                    lambda _: ocfg.appearance_network_lr, app_params["net"]
                ),
                "embeddings": ocfg.appearance_embeddings_lr,
            }
            out = jax.tree.map(upd, app_params, g_app, app_m, app_v, lr_tree)
            pick = lambda i: jax.tree.map(
                lambda t: t[i], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            app_params, app_m, app_v = pick(0), pick(1), pick(2)

        # densification statistics (train.py:186-188); gradients arrive in
        # pixel units -> NDC units via * (W/2, H/2) (rasterize_points.cu scale)
        ndc_scale = jnp.array([width * 0.5, height * 0.5], jnp.float32)
        g = gm.add_densification_stats(g, g_xy * ndc_scale, g_xyabs[:, 0], aux["visibility"])
        g = gm.update_max_radii(g, aux["radii"], aux["visibility"])

        metrics = {k: aux[k] for k in ["loss", "l1", "depth_normal_loss", "psnr",
                                       "n_overflow", "tile_overflow", "n_instances"]}
        return ts.replace(gaussians=g, app_params=app_params, app_m=app_m, app_v=app_v,
                          iteration=it), metrics

    return train_step


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("percent_dense",))
def densify_step(g: gm.GaussianState, key, max_grad, min_opacity, extent,
                 prune_big_ws, percent_dense=0.01):
    return gm.densify_and_prune(
        g, key, max_grad, min_opacity, extent,
        percent_dense=percent_dense, prune_big_ws=prune_big_ws,
    )


class SceneLike(NamedTuple):
    cameras: list  # [(Camera, gt_image (3,H,W), view_idx)]
    extent: float


class StopTraining(Exception):
    """Raised by a train() callback to end the loop gracefully (wall-clock
    budgets): train() returns the current state + history instead of dying
    in a timeout with the final-eval/mesh phases unreached."""


def autotune_pipeline(pcfg: PipelineConfig, n_ovf: float, t_ovf: float,
                      window_peak: float, capacity: int,
                      shrink_check: bool, vis_ovf: float = 0.0,
                      vis_peak: float = 0.0,
                      per_shard_cap: int = 0) -> tuple[PipelineConfig, bool]:
    """One application of the budget grow/shrink policy — the TPU analogue of
    the reference's resizeFunctional arena growth (rasterize_points.cu:27-33).

    Grow the instance budget on overflow ("no silent caps", SURVEY.md §5.7);
    shrink it when the budget is oversized: every binning/backward stage
    costs time proportional to the BUDGET, not the real instance count
    (BENCH_NOTES.md dense breakdown), so halving an underused budget is a
    ~2x step on those stages. Shrink is decided on the PEAK instance count
    over the caller's window (one sparse view must not flap the budget down
    and straight back up); halving only while peak * 2.5 < budget keeps
    >= 1.25x headroom after the halve; overflow growth recovers from
    mispredictions. Used by train() every iteration and by ``bench.py
    --scene dense --auto`` to settle the steady state before timing.

    Returns (new_pcfg, changed)."""
    from radegs_tpu.ops.binning import BUDGET_SEG, default_instance_budget, round_budget

    changed = False
    budget = pcfg.instance_budget or min(
        default_instance_budget(capacity, pcfg.instance_multiplier),
        MAX_INSTANCE_BUDGET,
    )
    # ``window_peak`` is the true demand (n_instances is the pre-clamp
    # count), so the target bucket is peak * 1.3 headroom rounded up
    # (round_budget); growth additionally jumps at least 1.5x so a
    # densification ramp costs O(log) recompiles, not one per 2M segment.
    target = round_budget(window_peak * 1.3)
    if n_ovf > 0 and budget < MAX_INSTANCE_BUDGET:
        new_budget = min(max(target, round_budget(budget * 3 // 2)),
                         MAX_INSTANCE_BUDGET)
        pcfg = replace_cfg(pcfg, instance_budget=new_budget)
        print(f"[radegs] instance overflow ({n_ovf:.0f}): growing budget "
              f"{budget} -> {new_budget}", flush=True)
        changed = True
    elif n_ovf > 0:
        print(f"[radegs] instance overflow ({n_ovf:.0f}) at the "
              f"{MAX_INSTANCE_BUDGET} budget cap — rendering truncated",
              flush=True)
    # shrink only on a meaningfully smaller bucket (>= 1 segment AND >= 15%)
    # so per-view peak jitter cannot flap the budget down and straight back
    if (not changed and shrink_check and target < budget
            and budget - target >= max(min(BUDGET_SEG, budget // 2),
                                       budget * 3 // 20)):
        pcfg = replace_cfg(pcfg, instance_budget=target)
        print(f"[radegs] budget underused "
              f"(peak {window_peak:.0f}/{budget}): shrinking to {target}",
              flush=True)
        changed = True
    # cap 16384: the Pallas path sizes nothing by max_per_tile (it only
    # clamps the per-tile walk), so the cap exists for the XLA-scan path's
    # (T, K) tile_gauss block; 4096 was measured to still drop 0.43% of
    # the dense bench's instances (34748 of 8.08M) — a silent-cap smell
    if t_ovf > 0 and pcfg.max_per_tile < 16384:
        pcfg = replace_cfg(pcfg, max_per_tile=pcfg.max_per_tile * 2)
        print(f"[radegs] tile overflow ({t_ovf:.0f}): growing max_per_tile to "
              f"{pcfg.max_per_tile}", flush=True)
        changed = True
    # mesh path: autotune the per-shard visibility-gather cap V (gather
    # bytes scale with V x n_devices; the strided rebalance keeps per-shard
    # visible counts even, so the measured worst-shard peak ``vis_peak``
    # (metrics n_vis_max) is a tight, safe target). Powers of two bucket
    # the recompiles; never below 4096.
    if per_shard_cap:
        cur_v = min(pcfg.vis_capacity, per_shard_cap) if pcfg.vis_capacity \
            else per_shard_cap

        def v_bucket(x):
            return min(per_shard_cap,
                       max(1 << 12, 1 << (int(x) - 1).bit_length()))

        if vis_ovf > 0 and cur_v < per_shard_cap:
            new_v = min(per_shard_cap, max(v_bucket(vis_peak * 1.3), cur_v * 2))
            pcfg = replace_cfg(pcfg, vis_capacity=new_v)
            print(f"[radegs] vis overflow ({vis_ovf:.0f}): growing gather "
                  f"cap {cur_v} -> {new_v}", flush=True)
            changed = True
        elif (shrink_check and vis_peak > 0
              and v_bucket(vis_peak * 1.5) < cur_v):
            new_v = v_bucket(vis_peak * 1.5)
            pcfg = replace_cfg(pcfg, vis_capacity=new_v)
            print(f"[radegs] gather cap underused (worst-shard peak "
                  f"{vis_peak:.0f}/{cur_v}): shrinking to {new_v}", flush=True)
            changed = True
    return pcfg, changed


def train(
    scene: SceneLike,
    gaussians: gm.GaussianState,
    mcfg: ModelConfig = ModelConfig(),
    ocfg: OptimizationConfig = OptimizationConfig(),
    pcfg: PipelineConfig = PipelineConfig(),
    seed: int = 0,
    log_every: int = 50,
    callbacks=(),
    resume_state: "TrainState | None" = None,
    mesh=None,
):
    """Host training loop reproducing train.py:91-214's schedule.

    ``resume_state``: a restored TrainState (utils.checkpoint) — training
    continues from its iteration counter (train.py:67-69 --start_checkpoint).

    ``mesh``: optional 1-D jax.sharding.Mesh — training then runs the
    explicit visibility-compressed multi-chip step (parallel/step.py:
    gaussians sharded over the axis, tile-band rasterization, halo losses;
    decoupled appearance runs replicated on the gathered 3-channel image).
    In mesh mode the particle axis is kept in a STRIDED balanced layout
    between densification events (parallel/rebalance.py — the SURVEY §2.4
    all-to-all rebalance; spreads the front-packed compaction output so
    per-shard visible counts stay ~equal); densify itself and the returned
    final state are canonical, so results match the single-device loop.
    Mid-loop callbacks see the internal strided order — per-particle ops
    and point-cloud exports are order-invariant, but don't assume slot i
    is the same particle as in a single-device run.
    """
    import numpy as np

    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    H, W = scene.cameras[0][0].height, scene.cameras[0][0].width
    if resume_state is not None:
        ts = resume_state
    else:
        ts = init_train_state(gaussians, sub, H, W, mcfg.use_decoupled_appearance)
    bg = jnp.ones(3) if mcfg.white_background else jnp.zeros(3)
    if mcfg.disable_filter3D:
        ts = ts.replace(gaussians=gm.reset_3d_filter(ts.gaussians))
    else:
        ts = ts.replace(gaussians=gm.update_3d_filter(
            ts.gaussians, [c[0] for c in scene.cameras]))

    if mesh is not None:
        from radegs_tpu.parallel.rebalance import to_canonical, to_strided
        from radegs_tpu.parallel.step import (
            AXIS, band_layout, make_sharded_train_step, pad_gt,
        )

        n_dev = mesh.shape[AXIS]
        _, _, H_pad = band_layout(H, n_dev)
        padded_gts = [pad_gt(gt, H_pad) for _, gt, _ in scene.cameras]

        # gt bound by view index so the padded copy is reused
        def make_step(mcfg_, ocfg_, pcfg_, spatial_lr_scale):
            inner = make_sharded_train_step(
                mcfg_, ocfg_, pcfg_, spatial_lr_scale=spatial_lr_scale,
                mesh=mesh, width=W, height=H,
                vis_capacity=pcfg_.vis_capacity or None,
            )

            def step(ts, cam, gt, bg_, vidx, width, height):
                with mesh:
                    return inner(ts, cam, padded_gts[int(vidx)], bg_, vidx)

            return step
    else:
        make_step = make_train_step

    step_fn = make_step(mcfg, ocfg, pcfg, spatial_lr_scale=scene.extent)
    if mesh is not None:
        # balanced strided layout for the sharded hot loop (see docstring)
        ts = ts.replace(gaussians=to_strided(ts.gaussians, n_dev))
    rng = np.random.default_rng(seed)
    stack = []
    history = []
    start_it = int(ts.iteration)
    prev_metrics = None  # overflow is checked EVERY iteration, one step late
    window_peak = 0.0  # peak n_instances since the last budget-shrink check
    vis_peak = 0.0  # worst-shard visible peak for the gather-cap autotune
    for it in range(start_it + 1, ocfg.iterations + 1):
        if it % 1000 == 0:
            ts = ts.replace(gaussians=gm.oneup_sh_degree(ts.gaussians))
        if not stack:
            stack = list(rng.permutation(len(scene.cameras)))
        cam, gt, vidx = scene.cameras[int(stack.pop())]
        ts, metrics = step_fn(ts, cam, gt, bg, vidx, cam.width, cam.height)

        if it < ocfg.densify_until_iter:
            if it > ocfg.densify_from_iter and it % ocfg.densification_interval == 0:
                key, sub = jax.random.split(key)
                if mesh is not None:
                    # densify semantics (per-slot PRNG draws, compaction
                    # argsort) are defined on the canonical order
                    ts = ts.replace(gaussians=to_canonical(ts.gaussians, n_dev))
                g2, dstats = densify_step(
                    ts.gaussians, sub, ocfg.densify_grad_threshold, 0.05,
                    scene.extent, it > ocfg.opacity_reset_interval,
                    percent_dense=ocfg.percent_dense,
                )
                ts = ts.replace(gaussians=g2)
                if not mcfg.disable_filter3D:
                    ts = ts.replace(gaussians=gm.update_3d_filter(
                        ts.gaussians, [c[0] for c in scene.cameras]))
                ts = ts.replace(gaussians=gm.maybe_grow(ts.gaussians))
                if mesh is not None:
                    # re-spread the front-packed compaction output (the
                    # stride is recomputed at the possibly-grown capacity)
                    ts = ts.replace(gaussians=to_strided(ts.gaussians, n_dev))
            if it % ocfg.opacity_reset_interval == 0 or (
                mcfg.white_background and it == ocfg.densify_from_iter
            ):
                ts = ts.replace(gaussians=reset_opacity_jit(ts.gaussians))
        elif it % 100 == 0 and not mcfg.disable_filter3D and it < ocfg.iterations - 100:
            ts = ts.replace(gaussians=gm.update_3d_filter(
                ts.gaussians, [c[0] for c in scene.cameras]))

        if it % log_every == 0 or it == ocfg.iterations:
            m = {k: float(v) for k, v in metrics.items()}
            m["iteration"] = it
            m["n_active"] = int(ts.gaussians.n_active())
            history.append(m)
        else:
            m = None

        # Autotune the static work buffers (one recompile per change; policy
        # in autotune_pipeline). Checked every iteration against the PREVIOUS
        # step's metrics: that step has already finished by the time this one
        # is enqueued, so the float() fetch hides behind the in-flight device
        # work instead of adding a host sync — at most one frame renders
        # truncated before the budget grows (vs up to log_every when polled).
        if prev_metrics is not None:
            window_peak = max(window_peak, float(prev_metrics["n_instances"]))
            vis_peak = max(vis_peak,
                           float(prev_metrics.get("n_vis_max", 0.0)))
            pcfg, changed = autotune_pipeline(
                pcfg, float(prev_metrics["n_overflow"]),
                float(prev_metrics["tile_overflow"]), window_peak,
                ts.gaussians.capacity, shrink_check=(it % 100 == 0),
                vis_ovf=float(prev_metrics.get("n_vis_overflow", 0.0)),
                vis_peak=vis_peak,
                per_shard_cap=(ts.gaussians.capacity // n_dev
                               if mesh is not None else 0),
            )
            if it % 100 == 0:
                window_peak = 0.0
                vis_peak = 0.0
            if changed:
                step_fn = make_step(mcfg, ocfg, pcfg, spatial_lr_scale=scene.extent)
        prev_metrics = metrics
        # callbacks run EVERY iteration; m is floats at log points, else None
        # (callbacks must not force device values off-schedule — each fetch
        # costs a host sync). A callback may raise StopTraining to end the
        # loop gracefully (wall-clock budgets): the current state + history
        # are returned exactly as if the schedule had completed.
        try:
            for cb in callbacks:
                cb(it, ts, m)
        except StopTraining:
            break
    if mesh is not None:
        ts = ts.replace(gaussians=to_canonical(ts.gaussians, n_dev))
    return ts, history


reset_opacity_jit = jax.jit(gm.reset_opacity, donate_argnums=(0,))

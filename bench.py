"""Headline benchmark: rays/s/chip, forward+backward, 1600x1200.

Runs one full training step (render -> L1+SSIM+normal-consistency loss ->
custom-VJP backward -> Adam -> densification stats) on a synthetic scene at
the DTU resolution (BASELINE.md primary throughput metric), times it after
warmup, and prints ONE JSON line.

``vs_baseline``: the snapshot ships no published numbers (BASELINE.md), so
the denominator is a documented estimate of the CUDA reference's training
throughput on its intended hardware: ~20 train-iters/s at 1600x1200 on an
RTX-3090-class GPU (RaDe-GS paper reports 3DGS-comparable minutes/30k-iter
training) = 38.4M rays/s.

Wedge-proofing: the TPU tunnel occasionally wedges (CLAUDE.md) — a raw run
then dies at backend init or hangs forever, losing the round's number
(BENCH_r02). This script therefore self-orchestrates: the parent process
probes the TPU with a 1-op subprocess under a timeout, runs the real
benchmark in a child (RADEGS_BENCH_INNER=1) with a hard timeout, and on any
failure waits out the tunnel's quiet-recovery window and retries. If the
TPU never comes back it still prints a well-formed JSON line carrying an
``error`` field instead of crashing.

``kernel_parity_max_err`` in the JSON is an on-device correctness record:
forward+backward Pallas outputs at a small size vs interpret mode (the
XLA-executed kernel semantics) — every driver capture doubles as the
on-TPU parity check for the MXU-precision and Mosaic-layout decisions
(the reference's analogue: the debug snapshot mechanism,
diff_gaussian_rasterization/__init__.py:86-93).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_RAYS_PER_S = 20.0 * 1600 * 1200  # documented estimate, see module docstring

WIDTH, HEIGHT = 1600, 1200
N_GAUSS = 100_000
CAPACITY = 131_072
WARMUP = 2
ITERS = 10

# --scene dense: converged-scene analogue — splats ON SURFACES at realistic
# density (a Mip-360-class run converges to 1-6M small splats)
DENSE_N = 1_200_000
DENSE_CAPACITY = 1 << 21

PROBE_TIMEOUT = 200  # healthy tunnel answers in seconds — unless the 1-op
# probe pays a COLD remote compile (60-110 s) on top of backend init (~20 s)
QUIET_WAIT = 310  # the wedge self-recovers after ~5 min of complete quiet
PROBE_ATTEMPTS = 3
RUN_ATTEMPTS = 2

PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128,128)) @ jnp.ones((128,128));"
    "print('PROBE_OK', float(x[0,0]), jax.devices()[0].platform)"
)


def _surface_points(n, rng, noise=1.0):
    """Points on a noisy sphere + ground plane (converged-scene analogue:
    splats concentrate on surfaces, scales come from true 3-NN spacing).

    ``noise`` scales the surface roughness; 0.0 gives the EXACT analytic
    surface (|x| = 1.3 sphere, y = -1.4 plane) whose closed-form distance
    field scripts/quality_dense.py uses as Chamfer ground truth."""
    n_sphere = (2 * n) // 3
    d = rng.normal(size=(n_sphere, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = 1.3 + noise * 0.05 * rng.normal(size=(n_sphere, 1))
    sphere = d * r
    n_plane = n - n_sphere
    plane = np.stack(
        [rng.uniform(-3, 3, n_plane), np.full(n_plane, -1.4)
         + noise * 0.02 * rng.normal(size=n_plane), rng.uniform(-3, 3, n_plane)],
        axis=1,
    )
    return np.concatenate([sphere, plane], 0).astype(np.float32)


def build_scene(seed=0, scene="100k"):
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.models import gaussian_model as gm

    rng = np.random.default_rng(seed)
    cam = Camera.look_at(
        [0.0, 0.8, -5.0], [0, 0, 0], [0, 1, 0], 0.9, 0.7, WIDTH, HEIGHT
    )
    if scene == "dense":
        pts = _surface_points(DENSE_N, rng)
        cols = rng.uniform(0.1, 0.9, size=(DENSE_N, 3)).astype(np.float32)
        capacity, shrink = DENSE_CAPACITY, 1.0  # no scale hack: real spacing
    else:
        pts = (rng.normal(size=(N_GAUSS, 3)) * 1.2).astype(np.float32)
        cols = rng.uniform(0.1, 0.9, size=(N_GAUSS, 3)).astype(np.float32)
        # shrink splats so the random cloud fits the instance budget
        # (3-NN init on a volumetric cloud gives ~12M instances at 1600x1200)
        capacity, shrink = CAPACITY, 0.22

    # one jit for setup: eagerly this is ~60 op-by-op compiles (~3min on a
    # cold remote-compile cache)
    @jax.jit
    def make_state(pts, cols):
        state = gm.create_from_points(pts, cols, capacity=capacity)
        if shrink != 1.0:
            state = state.replace(
                params=state.params.replace(
                    scaling=state.params.scaling + float(np.log(shrink))
                )
            )
        if scene == "dense":
            # converged-scene analogue: trained surface splats are opaque
            # (the 0.1 init would mean ~45-deep blending everywhere — a
            # worst case no real run sustains)
            state = state.replace(
                params=state.params.replace(
                    opacity=jnp.where(
                        state.active[:, None],
                        gm.inverse_sigmoid(jnp.float32(0.8)),
                        state.params.opacity,
                    )
                )
            )
        return gm.update_3d_filter(state, [cam])

    state = make_state(pts, cols)
    gt = jnp.clip(
        jnp.asarray(rng.uniform(size=(3, HEIGHT, WIDTH)), jnp.float32), 0.0, 1.0
    )
    return state, cam, gt


def kernel_parity_check():
    """Forward+backward Pallas on-device vs interpret mode at a small size
    (absorbed from scripts/_kernel_smoke.py). Returns the max error:
    absolute for forward accumulators, relative (to each output's max) for
    gradients; med_pos (int) counts as its mismatch fraction."""
    import jax
    import jax.numpy as jnp

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops import pallas_blend as pb
    from radegs_tpu.ops.binning import bin_gaussians

    rng = np.random.default_rng(3)
    P = 2000
    W = H = 256
    cam = Camera.look_at([0, 0.3, -4.0], [0, 0, 0], [0, 1, 0], 0.9, 0.9, W, H)

    @jax.jit
    def prep_fn(xyz, scales, quat, op, feat):
        return preprocess_gaussians(xyz, scales, quat, op, feat, sh_degree=0,
                                    camera=cam, kernel_size=0.1)

    prep = prep_fn(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.9, jnp.float32),
        jnp.asarray(rng.uniform(0.02, 0.25, (P, 3)), jnp.float32),
        jnp.asarray(np.tile([1.0, 0, 0, 0], (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0.05, 0.95, (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (P, 1, 3)), jnp.float32),
    )

    @jax.jit
    def bin_fn(prep):
        sg = jax.lax.stop_gradient
        return bin_gaussians(
            sg(prep.xy), sg(prep.radius), sg(prep.depth), prep.valid, W, H,
            instance_budget=1 << 15, max_per_tile=512,
            conic=sg(prep.conic),
            opacity=sg(jnp.where(prep.valid, prep.opacity, 0.0)),
            need_tile_gauss=False)

    binning = jax.block_until_ready(bin_fn(prep))
    inputs = (prep.xy, prep.conic, jnp.where(prep.valid, prep.opacity, 0.0),
              prep.rgb, prep.view_point, prep.camera_plane, prep.ray_plane,
              prep.normal, prep.ts)

    def fwd(interp):
        return jax.jit(lambda b, inp: pb.blend_forward_pallas(
            b, *inp, width=W, height=H, interpret=interp))

    out_dev = jax.block_until_ready(fwd(False)(binning, inputs))
    out_int = jax.block_until_ready(fwd(True)(binning, inputs))

    cot = {k: (jnp.ones_like(v) if k != "med_pos" else None)
           for k, v in out_dev.items()}

    def bwd(interp):
        return jax.jit(lambda b, inp, fo, c: pb.blend_backward_pallas(
            b, inp, fo, c, width=W, height=H, interpret=interp))

    g_dev = jax.block_until_ready(bwd(False)(binning, inputs, out_dev, cot))
    g_int = jax.block_until_ready(bwd(True)(binning, inputs, out_dev, cot))

    worst = 0.0
    for k in out_dev:
        a, b = np.asarray(out_dev[k]), np.asarray(out_int[k])
        err = (a != b).mean() if k == "med_pos" else np.abs(a - b).max()
        worst = max(worst, float(err))
    for k in g_dev:
        a, b = np.asarray(g_dev[k]), np.asarray(g_int[k])
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
        worst = max(worst, float(err))
    return worst


def inner_main(args):
    import jax
    import jax.numpy as jnp

    from radegs_tpu.train.config import ModelConfig, OptimizationConfig, PipelineConfig
    from radegs_tpu.train.loop import autotune_pipeline, init_train_state, make_train_step
    from radegs_tpu.utils.compilelog import CompileCounter

    # compile-wall accounting (VERDICT r4 #6): a bad autotune choice can cost
    # a 15-minute Mosaic compile — the artifact must carry that, not hide it
    compiles = CompileCounter().install()

    state, cam, gt = build_scene(scene=args.scene)
    ts = init_train_state(state, jax.random.PRNGKey(0))
    bg = jnp.zeros(3)

    mcfg = ModelConfig(kernel_size=0.1)
    ocfg = OptimizationConfig(regularization_from_iter=0)
    if args.scene == "100k":
        pcfg = PipelineConfig(max_per_tile=512)
    elif args.auto:
        # start from package defaults and let the training loop's budget
        # machinery settle (demonstrates, rather than asserts, that the
        # pinned config below is the converged steady state)
        pcfg = PipelineConfig()
    else:
        # the steady state the loop's budget machinery converges to on this
        # scene (demonstrated by --auto): this close-up view has 8.08M
        # instances (overflow probe reported 78k dropped at capacity*4), so
        # grow-on-overflow settles at capacity*8 = 16M; max_per_tile rides
        # the loop's grow policy — 4096 still dropped 34748 instances
        # (0.43%) on the deepest silhouette tiles, so the honest pin is
        # 8192 (the Pallas path sizes nothing by it; it's walk depth only)
        pcfg = PipelineConfig(max_per_tile=8192, instance_multiplier=8)
    step = make_train_step(mcfg, ocfg, pcfg, spatial_lr_scale=5.0)

    # report dropped work so the number can't silently lie (keep the
    # returned state: the step donates its input buffers)
    ts, m0 = step(ts, cam, gt, bg, 0, WIDTH, HEIGHT)
    if args.auto:
        # settle loop: one recompile per config change, identical policy to
        # train() (autotune_pipeline); stop at the first fixed point
        for _ in range(8):
            pcfg2, changed = autotune_pipeline(
                pcfg, float(m0["n_overflow"]), float(m0["tile_overflow"]),
                float(m0["n_instances"]), state.capacity, shrink_check=True,
            )
            if not changed:
                break
            pcfg = pcfg2
            step = make_train_step(mcfg, ocfg, pcfg, spatial_lr_scale=5.0)
            ts, m0 = step(ts, cam, gt, bg, 0, WIDTH, HEIGHT)
        print(f"# auto-tuned config: max_per_tile={pcfg.max_per_tile} "
              f"instance_budget={pcfg.instance_budget}", flush=True)
    novf, tovf = float(m0["n_overflow"]), float(m0["tile_overflow"])
    if novf > 0 or tovf > 0:
        print(f"# WARNING overflow: instances {novf:.0f} tiles {tovf:.0f}",
              flush=True)

    # chained steps with one final fetch: each step consumes the previous
    # TrainState, so the final loss forces the whole chain (verified to scale
    # linearly in N); a per-step fetch would add ~25ms tunnel latency each
    for _ in range(WARMUP):
        ts, metrics = step(ts, cam, gt, bg, 0, WIDTH, HEIGHT)
        float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        ts, metrics = step(ts, cam, gt, bg, 0, WIDTH, HEIGHT)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                ts, metrics = step(ts, cam, gt, bg, 0, WIDTH, HEIGHT)
            float(metrics["loss"])

    parity = None
    if not args.no_parity:
        t0 = time.perf_counter()
        parity = kernel_parity_check()
        print(f"# kernel parity check: {parity:.3e} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    rays_per_s = WIDTH * HEIGHT / dt
    suffix = "" if args.scene == "100k" else f"_{args.scene}"
    rec = {
        "metric": f"rays_per_s_per_chip_fwd_bwd_1600x1200{suffix}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }
    if parity is not None:
        rec["kernel_parity_max_err"] = float(f"{parity:.3e}")
    rec["xla_compiles"] = compiles.total
    rec["compile_wall_s"] = round(compiles.total_s, 1)
    print(json.dumps(rec))


def _run_scene(argv, inner_timeout):
    """Probe -> run child -> retry through wedges for ONE scene's argv.

    Returns (record_dict_or_None, last_err). Never raises for TPU
    unavailability."""
    last_err = "unknown"
    attempt = 0
    while attempt < RUN_ATTEMPTS:
        attempt += 1
        # --- probe until the tunnel answers (bounded) ---
        probe_ok = False
        for p in range(PROBE_ATTEMPTS):
            try:
                r = subprocess.run(
                    [sys.executable, "-c", PROBE_SRC], capture_output=True,
                    text=True, timeout=PROBE_TIMEOUT,
                )
                if r.returncode == 0 and "PROBE_OK" in r.stdout:
                    probe_ok = True
                    break
                last_err = f"probe rc={r.returncode}: {r.stderr.strip()[-300:]}"
            except subprocess.TimeoutExpired:
                last_err = f"probe hung >{PROBE_TIMEOUT}s (tunnel wedge)"
            print(f"# {last_err}; waiting {QUIET_WAIT}s quiet "
                  f"(probe {p + 1}/{PROBE_ATTEMPTS})", file=sys.stderr, flush=True)
            time.sleep(QUIET_WAIT)
        if not probe_ok:
            return None, last_err

        # --- real run in a child with a hard timeout ---
        env = dict(os.environ, RADEGS_BENCH_INNER="1")
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + argv,
                env=env, capture_output=True, text=True, timeout=inner_timeout,
            )
        except subprocess.TimeoutExpired:
            last_err = f"bench run hung >{inner_timeout}s (tunnel wedge mid-run)"
            print(f"# {last_err}; waiting {QUIET_WAIT}s quiet",
                  file=sys.stderr, flush=True)
            time.sleep(QUIET_WAIT)
            continue
        if r.stderr.strip():
            print(r.stderr, file=sys.stderr, flush=True)
        if r.returncode == 0 and '"metric"' in r.stdout:
            for line in r.stdout.splitlines():
                line = line.strip()
                if line.startswith("#"):
                    print(line, flush=True)
                elif line.startswith("{") and '"metric"' in line:
                    # surface the per-scene record IMMEDIATELY (as a comment
                    # line): if a later scene wedges and the whole process is
                    # killed by an outer timeout, this measurement survives
                    # in the log instead of dying in parent memory
                    print(f"# scene-result: {line}", flush=True)
                    return json.loads(line), last_err
            last_err = "child printed no parseable JSON line"
            return None, last_err
        last_err = (f"bench rc={r.returncode}: "
                    f"{(r.stderr or r.stdout).strip()[-400:]}")
        print(f"# {last_err}", file=sys.stderr, flush=True)
        if "UNAVAILABLE" in last_err or "DEADLINE" in last_err:
            time.sleep(QUIET_WAIT)
            continue
        return None, last_err  # a real (non-tunnel) failure: retrying won't help
    return None, last_err


def orchestrate(args, argv):
    """Parent-process harness: probe -> run child(ren) -> retry through wedges.

    Default (no --scene): runs BOTH the 100k headline scene and the dense
    --auto scene and merges them into ONE JSON line (VERDICT r3 #8) — the
    headline metric stays the 100k number; ``value_dense``/``vs_baseline_dense``
    carry the converged-scene measurement so rounds are judged on both.

    Never exits nonzero for TPU unavailability: the final fallback prints a
    well-formed JSON line with an ``error`` field so the driver's capture
    always parses (VERDICT r2 #2)."""
    # Another process holding the TPU makes every probe hang. Report (do NOT
    # kill by pattern — see CLAUDE.md); the operator/driver must resolve it.
    me = os.getpid()
    try:
        others = [
            line for line in subprocess.run(
                ["ps", "-eo", "pid,comm,etime"], capture_output=True, text=True,
                timeout=10,
            ).stdout.splitlines()[1:]
            if "python" in line and int(line.split()[0]) != me
        ]
        if others:
            print(f"# WARNING: other python processes alive (may hold the "
                  f"TPU): {others}", file=sys.stderr, flush=True)
    except Exception:
        pass

    if args.scene != "both":
        suffix = "" if args.scene == "100k" else f"_{args.scene}"
        metric = f"rays_per_s_per_chip_fwd_bwd_1600x1200{suffix}"
        inner_timeout = 4200 if (args.scene == "dense" or args.trace) else 2700
        rec, last_err = _run_scene(argv, inner_timeout)
        if rec is None:
            rec = {"metric": metric, "value": 0.0, "unit": "rays/s",
                   "vs_baseline": 0.0, "error": last_err[:400]}
        print(json.dumps(rec))
        return 0

    # --- scene "both": headline 100k + dense --auto, one merged line ---
    passthrough = [a for a in argv if a not in ("--scene", "both")]
    rec, err_100k = _run_scene(["--scene", "100k"] + passthrough, 2700)
    drec, err_dense = _run_scene(
        ["--scene", "dense", "--auto", "--no-parity"] + passthrough, 4200)
    if rec is None:
        rec = {"metric": "rays_per_s_per_chip_fwd_bwd_1600x1200", "value": 0.0,
               "unit": "rays/s", "vs_baseline": 0.0, "error": err_100k[:400]}
    if drec is not None:
        rec["value_dense"] = drec["value"]
        rec["vs_baseline_dense"] = drec["vs_baseline"]
        if "compile_wall_s" in drec:
            rec["compile_wall_s_dense"] = drec["compile_wall_s"]
    else:
        rec["dense_error"] = err_dense[:400]
    print(json.dumps(rec))
    return 0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=str, default=None,
                    help="capture a jax.profiler trace of 3 steps to DIR "
                         "(per-stage breakdown: scripts/bench_breakdown.py)")
    ap.add_argument("--scene", choices=["100k", "dense", "both"], default="both",
                    help="'dense': 1.2M surface splats at true 3-NN scales "
                         "(converged-scene analogue, no scale hack); 'both' "
                         "(default, orchestrator only): run 100k then dense "
                         "--auto and merge into one JSON line")
    ap.add_argument("--auto", action="store_true",
                    help="dense only: start from default PipelineConfig and "
                         "run the training loop's budget grow/shrink policy "
                         "to steady state before timing")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the on-device kernel parity check")
    args, _ = ap.parse_known_args()

    if os.environ.get("RADEGS_BENCH_INNER"):
        if args.scene == "both":  # 'both' is an orchestrator-level mode
            args.scene = "100k"
        inner_main(args)
    else:
        sys.exit(orchestrate(args, sys.argv[1:]))


if __name__ == "__main__":
    main()

"""Draft of the Pallas phase-A integrate kernel (integrateCUDA's image
phase, forward.cu:938-1133) + interpret-mode parity test vs
ops.integrate.integrate_image. Run on CPU:

    python scripts/_phase_a_draft.py          # interpret parity
    RUN_TPU=1 python scripts/_phase_a_draft.py  # also compile on TPU
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if not os.environ.get("RUN_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radegs_tpu.ops.binning import TileBinning, tile_grid
from radegs_tpu.ops.pallas_blend import sorted_features, _pad_lanes

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99
NI_OUT = 16  # [0:3 c, 3 expd, 4 medd, 5 maxd, 6 alpha, 7 T0,
#               8 mid_dc, 9 mid_p0, 10 mid_p1, 11 mid_x, 12 mid_y, 13-15 pad]


def _iimg_kernel(
    start_ref, count_ref,
    feat_hbm,
    out_ref,
    fbuf, abuf, dbuf, sems,
    *, chunk: int, tiles_x: int, tile: int,
):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    CH = chunk
    px = tile * tile

    tx = t % tiles_x
    ty = t // tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    # integrate samples at pixel CENTERS (+0.5, forward.cu:982)
    pix_x = (tx * tile + lane % tile).astype(jnp.float32) + 0.5
    pix_y = (ty * tile + lane // tile).astype(jnp.float32) + 0.5
    # corner offsets on sublanes 0..4 of an 8-row block
    k8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    offx = jnp.where(k8 == 0, 0.0, jnp.where((k8 == 1) | (k8 == 3), -0.5, 0.5))
    offy = jnp.where(k8 == 0, 0.0, jnp.where(k8 <= 2, -0.5, 0.5))
    corner_ok = (k8 < 5).astype(jnp.float32) + jnp.zeros((8, px), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)

    start_al = (start // CH) * CH
    head = start - start_al
    count_w = head + count
    n_chunks = jnp.where(count > 0, pl.cdiv(count_w, CH), 0)

    def dma(slot, ci):
        off = pl.multiple_of(start_al + ci * CH, CH)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, CH)], fbuf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    f32 = jnp.float32
    zrow = lambda: jnp.zeros((1, px), f32)
    init = dict(
        Ts=jnp.ones((8, px), f32),
        c0=zrow(), c1=zrow(), c2=zrow(),
        expd=zrow(), medd=zrow(), alpha=zrow(),
        maxd=jnp.full((1, px), -jnp.inf, f32),
        mid_dc=zrow(), mid_p0=zrow(), mid_p1=zrow(),
        mid_x=zrow(), mid_y=zrow(),
    )

    def body(ci, acc):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(1 - slot, ci + 1).start()

        dma(slot, ci).wait()
        f = fbuf[slot]  # (32, CH)
        ft = f.T  # (CH, 32)

        def col(i):
            return ft[:, i][:, None]  # (CH,1)

        idx = ci * CH + row
        in_range = ((idx >= head) & (idx < count_w)).astype(f32)  # (CH,1)

        # ---- vector phase: per-corner alpha/depth for the whole chunk ----
        # layout (CH*8, px): rows j*8+k = contributor j, corner k
        for k in range(5):
            ox = [0.0, -0.5, 0.5, -0.5, 0.5][k]
            oy = [0.0, -0.5, -0.5, 0.5, 0.5][k]
            dx = col(0) - (pix_x + ox)
            dy = col(1) - (pix_y + oy)
            power = -0.5 * (col(2) * dx * dx + col(4) * dy * dy) - col(3) * dx * dy
            al = jnp.minimum(MAX_ALPHA, col(5) * jnp.exp(jnp.minimum(power, 0.0)))
            passes = (power <= 0.0) & (al >= ALPHA_EPS)
            aval = jnp.where(passes, al, -1.0) * in_range + (in_range - 1.0)
            dval = col(9) + col(10) * dx + col(11) * dy
            abuf[pl.ds(k * CH, CH), :] = aval
            dbuf[pl.ds(k * CH, CH), :] = dval

        # ---- serial phase: the per-contributor skip-gate recurrence ----
        def sbody(j, acc):
            # gather this contributor's 5 corners into sublanes (one
            # dynamic-slice each from the two scratch banks)
            a5 = jnp.concatenate(
                [abuf[pl.ds(k * CH + j, 1), :] for k in range(5)]
                + [jnp.full((3, px), -1.0, f32)], axis=0)  # (8, px)
            d5 = jnp.concatenate(
                [dbuf[pl.ds(k * CH + j, 1), :] for k in range(5)]
                + [jnp.zeros((3, px), f32)], axis=0)
            passes = a5 >= 0.0
            al = jnp.maximum(a5, 0.0)
            Ts = acc["Ts"]
            test = Ts * (1.0 - al)
            ok = passes & (test >= T_EPS)
            acc["maxd"] = jnp.maximum(
                acc["maxd"],
                jnp.max(jnp.where(ok, d5, -jnp.inf), axis=0, keepdims=True),
            )
            T0_old = Ts[0:1]
            a0 = al[0:1]
            ok0 = ok[0:1]
            w = jnp.where(ok0, a0 * T0_old, 0.0)
            d0 = d5[0:1]
            acc["c0"] += w * col(6)[j]
            acc["c1"] += w * col(7)[j]
            acc["c2"] += w * col(8)[j]
            acc["alpha"] += w
            acc["expd"] += w * d0
            is_med = ok0 & (T0_old > 0.5)
            acc["medd"] = jnp.where(is_med, d0, acc["medd"])
            acc["mid_dc"] = jnp.where(is_med, col(9)[j] + 0.0 * d0, acc["mid_dc"])
            acc["mid_p0"] = jnp.where(is_med, col(10)[j] + 0.0 * d0, acc["mid_p0"])
            acc["mid_p1"] = jnp.where(is_med, col(11)[j] + 0.0 * d0, acc["mid_p1"])
            acc["mid_x"] = jnp.where(is_med, col(0)[j] + 0.0 * d0, acc["mid_x"])
            acc["mid_y"] = jnp.where(is_med, col(1)[j] + 0.0 * d0, acc["mid_y"])
            acc["Ts"] = jnp.where(ok, test, Ts)
            return acc

        return jax.lax.fori_loop(0, CH, sbody, acc)

    acc = jax.lax.fori_loop(0, n_chunks, body, init)
    out = jnp.concatenate(
        [acc["c0"], acc["c1"], acc["c2"], acc["expd"], acc["medd"],
         jnp.where(jnp.isfinite(acc["maxd"]), acc["maxd"], 0.0), acc["alpha"],
         acc["Ts"][0:1], acc["mid_dc"], acc["mid_p0"], acc["mid_p1"],
         acc["mid_x"], acc["mid_y"], jnp.zeros((3, px), f32)],
        axis=0,
    )
    out_ref[0] = out


def integrate_image_pallas(prep, binning: TileBinning, bg,
                           *, width, height, chunk=128, interpret=False):
    tiles_x, tiles_y = tile_grid(width, height)
    T = tiles_x * tiles_y
    px = 256
    inputs = (prep.xy, prep.conic, jnp.where(prep.valid, prep.opacity, 0.0),
              prep.rgb, prep.view_point, prep.camera_plane, prep.ray_plane,
              prep.normal, prep.ts)
    feat = _pad_lanes(sorted_features(binning, inputs), chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, NI_OUT, px), lambda t, s, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 32, chunk), jnp.float32),
            pltpu.VMEM((5 * chunk, px), jnp.float32),
            pltpu.VMEM((5 * chunk, px), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_iimg_kernel, chunk=chunk, tiles_x=tiles_x, tile=16),
        out_shape=jax.ShapeDtypeStruct((T, NI_OUT, px), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(binning.tile_start, binning.tile_count, feat)
    return out


def main():
    from radegs_tpu.core.camera import Camera
    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.binning import bin_gaussians
    from radegs_tpu.ops.integrate import integrate_image

    rng = np.random.default_rng(7)
    P = 60
    W = H = 64
    cam = Camera.look_at([0, 0, -4.0], [0, 0, 0], [0, 1, 0], 0.8, 0.8, W, H)
    prep = preprocess_gaussians(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.8, jnp.float32),
        jnp.asarray(rng.uniform(0.05, 0.35, (P, 3)), jnp.float32),
        jnp.asarray(np.tile([1.0, 0, 0, 0], (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0.2, 0.95, (P, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (P, 1, 3)), jnp.float32),
        sh_degree=0, camera=cam, kernel_size=0.1,
    )
    b = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, W, H,
                      instance_budget=1 << 12, max_per_tile=128)
    bg = jnp.zeros(3)
    ref_color, ref_mid = integrate_image(prep, b, bg, jnp.zeros((H, W), jnp.int32),
                                         width=W, height=H)
    out = integrate_image_pallas(prep, b, bg, width=W, height=H, chunk=16,
                                 interpret=not os.environ.get("RUN_TPU"))

    # untile helper
    tiles_x, tiles_y = tile_grid(W, H)

    def untile(x):  # (T, px) -> (H, W)
        img = np.asarray(x).reshape(tiles_y, tiles_x, 16, 16)
        return img.transpose(0, 2, 1, 3).reshape(tiles_y * 16, tiles_x * 16)[:H, :W]

    T0 = untile(out[:, 7])
    checks = {
        "c0": (untile(out[:, 0]) + T0 * float(bg[0]), np.asarray(ref_color[0])),
        "c1": (untile(out[:, 1]) + T0 * float(bg[1]), np.asarray(ref_color[1])),
        "expd": (untile(out[:, 3]), np.asarray(ref_color[3])),
        "medd": (untile(out[:, 4]), np.asarray(ref_color[4])),
        "maxd": (untile(out[:, 5]), np.asarray(ref_color[6])),
        "alpha": (untile(out[:, 6]), np.asarray(ref_color[7])),
    }
    okall = True
    for k, (a, r) in checks.items():
        err = np.abs(a - r).max()
        print(f"  {k}: max err {err:.3e}")
        okall &= err < 1e-5
    for k, ch in [("mid_dc", 8), ("mid_p0", 9), ("mid_x", 11)]:
        a = np.asarray(out[:, ch])
        r = np.asarray(ref_mid[{"mid_dc": "mid_dc", "mid_p0": "mid_p0",
                                "mid_x": "mid_x"}[k]])
        err = np.abs(a - r).max()
        print(f"  {k}: max err {err:.3e}")
        okall &= err < 1e-5
    print("PARITY OK" if okall else "PARITY FAIL")


if __name__ == "__main__":
    main()

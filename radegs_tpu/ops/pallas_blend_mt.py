"""Multi-tile ("occupancy-batched") Pallas blend kernels.

The single-tile kernels (ops/pallas_blend.py) pay a fixed per-program cost
(iota/triangular-matrix builds, accumulator init, grid-step overhead, DMA
granularity) for every 16x16 tile — ~7.5k programs on the 100k bench scene
at a mean occupancy of ~78 instance rows per 128-lane chunk. This module
batches ``gbatch`` CONSECUTIVE tiles per Pallas program:

- consecutive tiles are CONTIGUOUS in the depth-sorted flat instance list
  (ops/binning.py sorts by (tile, depth)), so the G runs form one combined
  128-aligned window streamed once with the same double-buffered DMA
  machinery — boundary chunks are fetched once instead of once per tile;
- the per-program fixed work (pixel iotas, lower-triangular scan matrix,
  sub-block scratch round-trip) is shared by all G tiles;
- per-tile state (accumulators, pixel origins, aux cotangent banks) is a
  static Python list of length G — everything stays (SUBK, 256)-shaped so
  the measured-good compute layout is untouched.

Backward-ring note: emitting sub-block rows tile-major inside the combined
walk (for s: for j:) preserves the GLOBAL ascending window order of the
single-tile kernel, so the compaction ring content — and therefore the
deterministic instance->gaussian reduction — is bit-identical. The parity
tests (tests/test_pallas_blend_mt.py) pin this against the single-tile
kernels in interpret mode.

Reference being chased: the CUDA per-tile blocks amortize their fixed cost
across a 16x16 thread block with no per-block relaunch overhead
(diff-gaussian-rasterization/cuda_rasterizer/forward.cu:428-693,
backward.cu:631-1016); this is the TPU analogue at Pallas-grid granularity.

``gbatch=1`` reproduces the single-tile kernels exactly (same op order);
the intended default after the device A/B is 4 (RADEGS_TILE_BATCH).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radegs_tpu.ops.binning import TileBinning, tile_grid
from radegs_tpu.ops.pallas_blend import (
    ALPHA_EPS, MAX_ALPHA, N_AUX, N_FEAT, N_GRAD, N_GRAD_PAD, N_OUT, PACK_SEG,
    SUB, T_EPS, _check_sub, _cumor0_mxu, _cumprod0, _lower_tri, _mm,
    _pad_lanes, _reduce_grad_rows, _RING_IMPL, _shift_down,
    packed_or_sorted_features,
)

import os as _os


def _combined_window(starts, counts, CH):
    """(lo_aligned, n_chunks) of the union window over G contiguous runs.

    Empty runs are skipped; an all-empty group yields n_chunks = 0. The
    runs of consecutive tiles are contiguous (separated only by their sort
    sentinels), so the union is one interval."""
    BIG = jnp.int32(1 << 30)
    lo = BIG
    hi = jnp.int32(0)
    for s, c in zip(starts, counts):
        lo = jnp.minimum(lo, jnp.where(c > 0, s, BIG))
        hi = jnp.maximum(hi, jnp.where(c > 0, s + c, 0))
    any_rows = hi > 0
    start_al = jnp.where(any_rows, (lo // CH) * CH, 0)
    n_chunks = jnp.where(any_rows, pl.cdiv(hi - start_al, CH), 0)
    return start_al, n_chunks


def _fwd_kernel_mt(
    # scalar prefetch
    start_ref, count_ref,
    # inputs
    feat_hbm,
    # outputs
    out_ref,
    # scratch
    fbuf, subbuf, sems,
    *, chunk: int, tiles_x: int, tile: int, gbatch: int,
):
    p = pl.program_id(0)
    G = gbatch
    CH = chunk
    px = tile * tile
    SUBK = min(SUB, CH)
    t0 = p * G

    starts = [start_ref[t0 + j] for j in range(G)]
    counts = [count_ref[t0 + j] for j in range(G)]
    start_al, n_chunks = _combined_window(starts, counts, CH)
    heads = [s - start_al for s in starts]  # window-relative run starts
    counts_w = [h + c for h, c in zip(heads, counts)]

    # shared per-program fixed work (amortized over the G tiles)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    pix_x = (lane % tile).astype(jnp.float32)
    pix_y = (lane // tile).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (SUBK, 1), 0)
    tri = _lower_tri(SUBK)
    # per-tile pixel origins (tile-local coordinate frames, see _fwd_kernel)
    oxs = [(((t0 + j) % tiles_x) * tile).astype(jnp.float32) for j in range(G)]
    oys = [(((t0 + j) // tiles_x) * tile).astype(jnp.float32) for j in range(G)]

    def dma(slot, ci):
        off = pl.multiple_of(start_al + ci * CH, CH)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, CH)], fbuf.at[slot], sems.at[slot]
        )

    # chunk 0 of program 0 has no predecessor to prefetch it (see epilogue)
    @pl.when((p == 0) & (n_chunks > 0))
    def _():
        dma(0, 0).start()

    f32 = jnp.float32
    zeros = lambda: jnp.zeros((1, px), f32)
    init = dict(
        t_cur=jnp.ones((1, px), f32),
        done=jnp.zeros((1, px), jnp.float32),
        c_r=zeros(), c_g=zeros(), c_b=zeros(),
        wsum=zeros(), dist=zeros(),
        x0=zeros(), x1=zeros(), x2=zeros(),
        n0=zeros(), n1=zeros(), n2=zeros(),
        med_t=zeros(), m0=zeros(), m1=zeros(), m2=zeros(),
        med_pos=jnp.full((1, px), -1, jnp.int32),
    )

    def sub_step(f_sub, row0, head, count_w, ox, oy, acc):
        """One SUBK-row sub-block against ONE tile's 256 pixels — the exact
        math of pallas_blend._fwd_kernel.sub_step, parameterized by the
        tile's window range and pixel origin."""
        ft = f_sub.T  # (SUBK, 32)

        def col(i):
            return ft[:, i][:, None]

        def frow(i):
            return f_sub[i : i + 1, :]

        idx = row0 + srow
        in_range = (idx >= head) & (idx < count_w)
        xl = col(0) - ox
        yl = col(1) - oy
        dx = xl - pix_x
        dy = yl - pix_y
        ca, cb, cc = col(2), col(3), col(4)
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        falloff = jnp.exp(jnp.minimum(power, 0.0))
        raw = col(5) * falloff
        alpha = jnp.minimum(MAX_ALPHA, raw)
        cand = (power <= 0.0) & (alpha >= ALPHA_EPS) & in_range
        alpha = jnp.where(cand, alpha, 0.0)
        one_minus = 1.0 - alpha

        cum = _cumprod0(one_minus, SUBK)
        t_prefix = acc["t_cur"] * _shift_down(cum, 1, 1.0)
        terminate = (alpha > 0.0) & (t_prefix * one_minus < T_EPS)
        killed = _cumor0_mxu(jnp.where(terminate, 1.0, 0.0), tri)
        include = (alpha > 0.0) & ~killed & (acc["done"] < 0.5)
        w = jnp.where(include, alpha * t_prefix, 0.0)

        xr, yr = frow(0) - ox, frow(1) - oy
        a_t = frow(9) + frow(10) * xr + frow(11) * yr
        a_cx = frow(12) + frow(15) * xr + frow(18) * yr
        a_cy = frow(13) + frow(16) * xr + frow(19) * yr
        a_cz = frow(14) + frow(17) * xr + frow(20) * yr
        basis = jnp.concatenate(
            [
                a_t, frow(10), frow(11),
                a_cx, frow(15), frow(18),
                a_cy, frow(16), frow(19),
                a_cz, frow(17), frow(20),
                frow(6), frow(7), frow(8),
                jnp.ones((1, SUBK), f32),
                frow(21), frow(22), frow(23),
            ],
            axis=0,
        )  # (19, SUBK)
        R = _mm(basis, w)  # (19, px)

        def affine(b, k):
            return b[k : k + 1] - pix_x * b[k + 1 : k + 2] - pix_y * b[k + 2 : k + 3]

        acc["c_r"] += R[12:13]
        acc["c_g"] += R[13:14]
        acc["c_b"] += R[14:15]
        acc["wsum"] += R[15:16]
        acc["n0"] += R[16:17]
        acc["n1"] += R[17:18]
        acc["n2"] += R[18:19]
        acc["dist"] += affine(R, 0)
        acc["x0"] += affine(R, 3)
        acc["x1"] += affine(R, 6)
        acc["x2"] += affine(R, 9)

        pos = idx - head
        med_mask = include & (t_prefix > 0.5)
        cand_pos = jnp.where(med_mask, pos + jnp.zeros_like(dx, jnp.int32), -1)
        chunk_med = jnp.max(cand_pos, axis=0, keepdims=True)
        has = chunk_med >= 0
        sel = jnp.where(med_mask & (cand_pos == chunk_med), 1.0, 0.0)
        S = _mm(basis[:12], sel)

        acc["med_t"] = jnp.where(has, affine(S, 0), acc["med_t"])
        acc["m0"] = jnp.where(has, affine(S, 3), acc["m0"])
        acc["m1"] = jnp.where(has, affine(S, 6), acc["m1"])
        acc["m2"] = jnp.where(has, affine(S, 9), acc["m2"])
        acc["med_pos"] = jnp.where(has, chunk_med, acc["med_pos"])

        t_term = jnp.max(jnp.where(terminate, t_prefix, 0.0), axis=0, keepdims=True)
        any_term = jnp.max(jnp.where(terminate, 1.0, 0.0), axis=0, keepdims=True)
        t_open = acc["t_cur"] * cum[SUBK - 1 : SUBK]
        t_new = jnp.where(any_term > 0.5, t_term, t_open)
        acc["t_cur"] = jnp.where(acc["done"] > 0.5, acc["t_cur"], t_new)
        acc["done"] = jnp.maximum(acc["done"], any_term)
        return acc

    def body(ci, accs):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(1 - slot, ci + 1).start()

        dma(slot, ci).wait()
        f = fbuf[slot]  # (32, CH)

        accs = list(accs)
        for s in range(CH // SUBK):
            row0 = ci * CH + s * SUBK
            # one scratch round-trip per sub-block, SHARED by the G tiles
            # (the single-tile kernel pays it per (tile, sub-block))
            subbuf[...] = f[:, s * SUBK : (s + 1) * SUBK]
            fs = subbuf[...]
            for j in range(G):
                active = jnp.min(accs[j]["done"]) < 0.5
                overlap = (active & (row0 + SUBK > heads[j])
                           & (row0 < counts_w[j]))
                accs[j] = jax.lax.cond(
                    overlap,
                    lambda a, fs=fs, row0=row0, j=j: sub_step(
                        fs, row0, heads[j], counts_w[j], oxs[j], oys[j], a),
                    lambda a: a,
                    accs[j],
                )
        return tuple(accs)

    accs = jax.lax.fori_loop(0, n_chunks, body, tuple(init.copy() for _ in range(G)))

    # speculative prefetch of the NEXT program's first chunk (slot 0 is free:
    # every DMA of this program was consumed by its own body)
    np0 = t0 + G

    @pl.when(p + 1 < pl.num_programs(0))
    def _():
        nstarts = [start_ref[np0 + j] for j in range(G)]
        ncounts = [count_ref[np0 + j] for j in range(G)]
        nstart_al, n_next = _combined_window(nstarts, ncounts, CH)

        @pl.when(n_next > 0)
        def _():
            pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(nstart_al, CH), CH)],
                fbuf.at[0], sems.at[0],
            ).start()

    for j in range(G):
        acc = accs[j]
        out_ref[j] = jnp.concatenate(
            [
                acc["c_r"], acc["c_g"], acc["c_b"], acc["wsum"], acc["dist"],
                acc["x0"], acc["x1"], acc["x2"], acc["n0"], acc["n1"],
                acc["n2"], acc["med_t"], acc["m0"], acc["m1"], acc["m2"],
                acc["t_cur"], pltpu.bitcast(acc["med_pos"], jnp.float32),
            ],
            axis=0,
        )  # (17, px)


def _pad_tiles(x, Tp):
    """Pad a (T, ...)-leading array with zeros up to Tp rows."""
    T = x.shape[0]
    if T == Tp:
        return x
    return jnp.pad(x, [(0, Tp - T)] + [(0, 0)] * (x.ndim - 1))


@functools.partial(jax.jit, static_argnames=("width", "height", "tile", "chunk",
                                             "gbatch", "interpret"))
def blend_forward_pallas_mt(
    binning: TileBinning,
    xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts,
    *, width: int, height: int, tile: int = 16, chunk: int = 128,
    gbatch: int = 4, interpret: bool = False,
):
    """Forward blend, ``gbatch`` tiles per Pallas program. Same contract as
    pallas_blend.blend_forward_pallas (bit-identical outputs)."""
    _check_sub(chunk)
    tiles_x, tiles_y = tile_grid(width, height, tile)
    T = tiles_x * tiles_y
    px = tile * tile
    NP = (T + gbatch - 1) // gbatch
    Tp = NP * gbatch

    inputs = (xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts)
    feat_sorted = _pad_lanes(
        packed_or_sorted_features(
            binning, inputs,
            seg_rows=PACK_SEG if binning.gauss_id.shape[0] > PACK_SEG else None),
        chunk)  # (32, B')

    start_p = _pad_tiles(binning.tile_start, Tp)
    count_p = _pad_tiles(binning.tile_count, Tp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (gbatch, N_OUT, px), lambda p, s, c: (p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, N_FEAT, chunk), jnp.float32),
            pltpu.VMEM((N_FEAT, min(SUB, chunk)), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_mt, chunk=chunk, tiles_x=tiles_x,
                          tile=tile, gbatch=gbatch),
        out_shape=jax.ShapeDtypeStruct((Tp, N_OUT, px), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start_p, count_p, feat_sorted)
    out = out[:T]

    return {
        "color_raw": out[:, 0:3].transpose(1, 0, 2),
        "weight": out[:, 3],
        "dist_raw": out[:, 4],
        "coord_raw": out[:, 5:8].transpose(1, 0, 2),
        "normal_raw": out[:, 8:11].transpose(1, 0, 2),
        "med_t": out[:, 11],
        "med_coord": out[:, 12:15].transpose(1, 0, 2),
        "t_final": out[:, 15],
        "med_pos": jax.lax.bitcast_convert_type(out[:, 16], jnp.int32),
    }


# ============================================================== backward ====


def _bwd_kernel_mt(
    # scalar prefetch
    start_ref, count_ref,
    # inputs
    feat_hbm, aux_ref,
    # output
    grad_hbm,
    # scratch
    fbuf, subbuf, stage, flbuf, fsems, flsems, fill_smem,
    *, chunk: int, tiles_x: int, tile: int, width: int, height: int,
    gbatch: int, orient: str = "mn",
):
    p = pl.program_id(0)
    G = gbatch
    CH = chunk
    px = tile * tile
    SUBK = min(SUB, CH)
    RING = 2 * CH
    t0 = p * G

    starts = [start_ref[t0 + j] for j in range(G)]
    counts = [count_ref[t0 + j] for j in range(G)]
    start_al, n_chunks = _combined_window(starts, counts, CH)
    heads = [s - start_al for s in starts]
    counts_w = [h + c for h, c in zip(heads, counts)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    pix_x = (lane % tile).astype(jnp.float32)
    pix_y = (lane // tile).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (SUBK, 1), 0)
    tri = _lower_tri(SUBK)
    oxs = [(((t0 + j) % tiles_x) * tile).astype(jnp.float32) for j in range(G)]
    oys = [(((t0 + j) // tiles_x) * tile).astype(jnp.float32) for j in range(G)]

    def fdma(slot, ci):
        off = pl.multiple_of(start_al + ci * CH, CH)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, CH)], fbuf.at[slot], fsems.at[slot]
        )

    @pl.when(p == 0)
    def _():
        fill_smem[0] = 0

    def fl_dma(slot, k):
        off = pl.multiple_of(k * CH, CH)
        return pltpu.make_async_copy(
            flbuf.at[slot], grad_hbm.at[:, pl.ds(off, CH)], flsems.at[slot]
        )

    def flush(k):
        slot = jax.lax.rem(k, 2)

        @pl.when(k >= 2)
        def _():
            fl_dma(slot, k - 2).wait()

        half = jax.lax.rem(k, 2)
        flbuf[slot] = stage[:, pl.ds(pl.multiple_of(half * CH, CH), CH)]
        fl_dma(slot, k).start()

    ring_lane = jax.lax.broadcasted_iota(jnp.int32, (1, RING), 1)
    sub_j = jax.lax.broadcasted_iota(jnp.int32, (SUBK, RING), 0)
    ring_r = jax.lax.broadcasted_iota(jnp.int32, (SUBK, RING), 1)

    def stage_put(gmat_t, lo, nreal, fill):
        # identical to pallas_blend._bwd_kernel.stage_put
        fill_mod = jax.lax.rem(fill, RING)
        written = jax.lax.rem(ring_lane - fill_mod + RING, RING) < nreal
        if _RING_IMPL == "roll":
            padded = jnp.concatenate(
                [gmat_t, jnp.zeros((N_GRAD_PAD, RING - SUBK), jnp.float32)],
                axis=1,
            )
            shift = jax.lax.rem(fill_mod - lo + RING, RING)
            add = pltpu.roll(padded, shift, 1)
        else:
            rel = jax.lax.rem(ring_r - fill_mod + RING, RING)
            sp = jnp.where(
                (rel == sub_j - lo) & (sub_j >= lo) & (sub_j < lo + nreal), 1.0, 0.0
            )
            add = jax.lax.dot_general(
                gmat_t, sp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        stage[...] = jnp.where(written, add, stage[...])

    @pl.when((p == 0) & (n_chunks > 0))
    def _():
        fdma(0, 0).start()

    # per-tile cotangent/total banks from the (G, N_AUX, px) aux block
    f32 = jnp.float32
    zrow = lambda: jnp.zeros((1, px), f32)
    GC0, GN0, GX0, GMX0, GD, GMT, ONE = 0, 3, 6, 9, 12, 13, 14
    banks = []
    for j in range(G):
        def a(k, j=j):
            return aux_ref[j, k : k + 1, :]

        gc = [a(k) for k in range(0, 3)]
        gw, gd = a(3), a(4)
        gx = [a(k) for k in range(5, 8)]
        gn = [a(k) for k in range(8, 11)]
        gtf, gmt = a(11), a(12)
        gmx = [a(k) for k in range(13, 16)]
        tc = [a(k) for k in range(16, 19)]
        tw, td = a(19), a(20)
        txx = [a(k) for k in range(21, 24)]
        tn = [a(k) for k in range(24, 27)]
        tf = a(27)
        mp = pltpu.bitcast(a(28), jnp.int32)

        s_tot = gw * tw + gd * td
        for k in range(3):
            s_tot = s_tot + gc[k] * tc[k] + gn[k] * tn[k] + gx[k] * txx[k]

        vbank_rows = jnp.concatenate(
            gc + gn + gx + gmx + [gd, gmt, jnp.ones((1, px), f32), zrow()],
            axis=0,
        )  # (16, px)
        vbank = vbank_rows.T if orient == "mn" else vbank_rows

        dw_bank = jnp.concatenate(
            [gd, -pix_x * gd, -pix_y * gd]
            + [v for k in range(3) for v in (gx[k], -pix_x * gx[k], -pix_y * gx[k])]
            + gc
            + [gw]
            + gn,
            axis=0,
        )  # (19, px)
        banks.append(dict(s_tot=s_tot, gtf=gtf, tf=tf, mp=mp, vbank=vbank,
                          dw_bank=dw_bank))

    init = dict(t_cur=jnp.ones((1, px), f32), done=zrow(), pre_dot=zrow())

    if orient == "mn":
        skip_gmat = jnp.concatenate(
            [jnp.zeros((SUBK, N_GRAD), f32), jnp.full((SUBK, 1), -1.0, f32),
             jnp.zeros((SUBK, N_GRAD_PAD - N_GRAD - 1), f32)], axis=1)
    else:
        _grow = jax.lax.broadcasted_iota(jnp.int32, (N_GRAD_PAD, SUBK), 0)
        skip_gmat = jnp.where(_grow == N_GRAD, -1.0, 0.0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, SUBK), 1)

    def sub_step(f_sub, row0, head, count_w, ox, oy, bank, acc):
        """The exact math of pallas_blend._bwd_kernel.sub_step, with the
        tile's window range / origin / cotangent bank as parameters."""
        ft = f_sub.T

        def col(i):
            return ft[:, i][:, None]

        def frow(i):
            return f_sub[i : i + 1, :]

        idx = row0 + srow
        in_range = (idx >= head) & (idx < count_w)
        xl = col(0) - ox
        yl = col(1) - oy
        dx = xl - pix_x
        dy = yl - pix_y
        ca, cb, cc = col(2), col(3), col(4)
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        falloff = jnp.exp(jnp.minimum(power, 0.0))
        raw = col(5) * falloff
        alpha = jnp.minimum(MAX_ALPHA, raw)
        cand = (power <= 0.0) & (alpha >= ALPHA_EPS) & in_range
        alpha = jnp.where(cand, alpha, 0.0)
        one_minus = 1.0 - alpha

        cum = _cumprod0(one_minus, SUBK)
        t_prefix = acc["t_cur"] * _shift_down(cum, 1, 1.0)
        terminate = (alpha > 0.0) & (t_prefix * one_minus < T_EPS)
        killed = _cumor0_mxu(jnp.where(terminate, 1.0, 0.0), tri)
        include = (alpha > 0.0) & ~killed & (acc["done"] < 0.5)
        w = jnp.where(include, alpha * t_prefix, 0.0)

        xr, yr = frow(0) - ox, frow(1) - oy
        a_t = frow(9) + frow(10) * xr + frow(11) * yr
        a_cx = frow(12) + frow(15) * xr + frow(18) * yr
        a_cy = frow(13) + frow(16) * xr + frow(19) * yr
        a_cz = frow(14) + frow(17) * xr + frow(20) * yr
        basis = jnp.concatenate(
            [
                a_t, frow(10), frow(11),
                a_cx, frow(15), frow(18),
                a_cy, frow(16), frow(19),
                a_cz, frow(17), frow(20),
                frow(6), frow(7), frow(8),
                jnp.ones((1, SUBK), f32),
                frow(21), frow(22), frow(23),
            ],
            axis=0,
        )  # (19, SUBK)
        dL_dw = _mm(basis.T, bank["dw_bank"])  # (SUBK, px)

        pdot = acc["pre_dot"] + _mm(tri, w * dL_dw)
        suffix = (bank["s_tot"] - pdot) + bank["gtf"] * bank["tf"]
        dL_dalpha = jnp.where(include, t_prefix * dL_dw - suffix / one_minus, 0.0)

        pos = (idx - head) + jnp.zeros((SUBK, px), jnp.int32)
        is_med = include & (pos == bank["mp"])
        is_med_f = jnp.where(is_med, 1.0, 0.0)

        unclipped = (raw < MAX_ALPHA) & include
        dL_draw = jnp.where(unclipped, dL_dalpha, 0.0)
        dL_dG = dL_draw * col(5)

        gdx, gdy = falloff * dx, falloff * dy
        e_x = dL_dG * (-gdx * ca - gdy * cb)
        e_y = dL_dG * (-gdy * cc - gdx * cb)

        M = jnp.concatenate(
            [
                w, w * dx, w * dy,
                is_med_f, is_med_f * dx, is_med_f * dy,
                e_x, e_y, jnp.abs(e_x), jnp.abs(e_y),
                dL_draw * falloff,
                -0.5 * gdx * dx * dL_dG, -gdx * dy * dL_dG, -0.5 * gdy * dy * dL_dG,
            ],
            axis=0,
        )  # (14*SUBK, px)
        if orient == "mn":
            R = _mm(M, bank["vbank"], precision=jax.lax.Precision.DEFAULT)

            def r(b, c):
                return R[b * SUBK : (b + 1) * SUBK, c : c + 1]

            sc = col
        else:
            R = jax.lax.dot_general(
                bank["vbank"], M, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (16, 14*SUBK)

            def r(b, c):
                return R[c : c + 1, b * SUBK : (b + 1) * SUBK]

            sc = frow

        out_t = r(0, GD) + r(3, GMT)
        out_coord = [r(0, GX0 + k) + r(3, GMX0 + k) for k in range(3)]
        out_dx = r(6, ONE) + sc(10) * out_t
        out_dy = r(7, ONE) + sc(11) * out_t
        for k in range(3):
            out_dx = out_dx + sc(15 + k) * out_coord[k]
            out_dy = out_dy + sc(18 + k) * out_coord[k]

        cols = [
            out_dx, out_dy,
            (width * 0.5) * r(8, ONE) + (height * 0.5) * r(9, ONE),
            r(11, ONE), r(12, ONE), r(13, ONE),
            r(10, ONE),
            r(0, GC0), r(0, GC0 + 1), r(0, GC0 + 2),
            out_coord[0], out_coord[1], out_coord[2],
            r(1, GX0) + r(4, GMX0), r(1, GX0 + 1) + r(4, GMX0 + 1),
            r(1, GX0 + 2) + r(4, GMX0 + 2),
            r(2, GX0) + r(5, GMX0), r(2, GX0 + 1) + r(5, GMX0 + 1),
            r(2, GX0 + 2) + r(5, GMX0 + 2),
            r(1, GD) + r(4, GMT), r(2, GD) + r(5, GMT),
            r(0, GN0), r(0, GN0 + 1), r(0, GN0 + 2),
            out_t,
        ]
        if orient == "mn":
            gmat = jnp.concatenate(cols, axis=1)  # (SUBK, 25)
            gid_col = jnp.where(in_range, col(24), -1.0)
            gmat = jnp.concatenate(
                [gmat, gid_col,
                 jnp.zeros((SUBK, N_GRAD_PAD - N_GRAD - 1), f32)], axis=1)
        else:
            in_range_row = (row0 + lane_s >= head) & (row0 + lane_s < count_w)
            gid_row = jnp.where(in_range_row, frow(24), -1.0)
            gmat = jnp.concatenate(
                cols + [gid_row,
                        jnp.zeros((N_GRAD_PAD - N_GRAD - 1, SUBK), f32)],
                axis=0)  # (N_GRAD_PAD, SUBK)

        t_term = jnp.max(jnp.where(terminate, t_prefix, 0.0), axis=0, keepdims=True)
        any_term = jnp.max(jnp.where(terminate, 1.0, 0.0), axis=0, keepdims=True)
        t_open = acc["t_cur"] * cum[SUBK - 1 : SUBK]
        t_new = jnp.where(any_term > 0.5, t_term, t_open)
        acc["t_cur"] = jnp.where(acc["done"] > 0.5, acc["t_cur"], t_new)
        acc["done"] = jnp.maximum(acc["done"], any_term)
        acc["pre_dot"] = pdot[SUBK - 1 : SUBK]
        return acc, gmat

    def body(ci, accs):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            fdma(1 - slot, ci + 1).start()

        fdma(slot, ci).wait()
        f = fbuf[slot]

        accs = list(accs)
        for s in range(CH // SUBK):
            row0 = ci * CH + s * SUBK
            subbuf[...] = f[:, s * SUBK : (s + 1) * SUBK]
            fs = subbuf[...]
            # tile-major emission inside the sub-block preserves the global
            # ascending window order (runs are contiguous and ordered), so
            # the ring content matches the single-tile kernel bit-for-bit
            for j in range(G):
                active = jnp.min(accs[j]["done"]) < 0.5
                overlap = (active & (row0 + SUBK > heads[j])
                           & (row0 < counts_w[j]))
                accs[j], gmat = jax.lax.cond(
                    overlap,
                    lambda a, fs=fs, row0=row0, j=j: sub_step(
                        fs, row0, heads[j], counts_w[j], oxs[j], oys[j],
                        banks[j], a),
                    lambda a: (a, skip_gmat),
                    accs[j],
                )
                lo = jnp.clip(heads[j] - row0, 0, SUBK)
                hi = jnp.clip(counts_w[j] - row0, 0, SUBK)
                nreal = jnp.maximum(hi - lo, 0)

                @pl.when(nreal > 0)
                def _(gmat=gmat, lo=lo, nreal=nreal):
                    fill = fill_smem[0]
                    stage_put(gmat.T if orient == "mn" else gmat, lo, nreal, fill)
                    new_fill = fill + nreal

                    @pl.when(new_fill // CH > fill // CH)
                    def _():
                        flush(fill // CH)

                    fill_smem[0] = new_fill

        return tuple(accs)

    jax.lax.fori_loop(0, n_chunks, body, tuple(init.copy() for _ in range(G)))

    np0 = t0 + G

    @pl.when(p + 1 < pl.num_programs(0))
    def _():
        nstarts = [start_ref[np0 + j] for j in range(G)]
        ncounts = [count_ref[np0 + j] for j in range(G)]
        nstart_al, n_next = _combined_window(nstarts, ncounts, CH)

        @pl.when(n_next > 0)
        def _():
            pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(nstart_al, CH), CH)],
                fbuf.at[0], fsems.at[0],
            ).start()

    # final program: pad + flush the open partial chunk, wait in-flight DMAs
    @pl.when(p == pl.num_programs(0) - 1)
    def _():
        fill = fill_smem[0]
        pad = jax.lax.rem(CH - jax.lax.rem(fill, CH), CH)

        @pl.when(pad > 0)
        def _():
            fill_mod = jax.lax.rem(fill, RING)
            written = jax.lax.rem(ring_lane - fill_mod + RING, RING) < pad
            grow = jax.lax.broadcasted_iota(jnp.int32, (N_GRAD_PAD, RING), 0)
            pad_vals = jnp.where(grow == N_GRAD, -1.0, 0.0)
            stage[...] = jnp.where(written, pad_vals, stage[...])
            flush(fill // CH)

        total_flushes = (fill + pad) // CH

        @pl.when(total_flushes >= 2)
        def _():
            k = total_flushes - 2
            fl_dma(jax.lax.rem(k, 2), k).wait()

        @pl.when(total_flushes >= 1)
        def _():
            k = total_flushes - 1
            fl_dma(jax.lax.rem(k, 2), k).wait()


@functools.partial(jax.jit, static_argnames=("width", "height", "tile", "chunk",
                                             "gbatch", "interpret", "reduce",
                                             "orient"))
def blend_backward_pallas_mt(
    binning: TileBinning,
    inputs,
    fwd_out,
    cot,
    *, width: int, height: int, tile: int = 16, chunk: int = 128,
    gbatch: int = 4, interpret: bool = False,
    reduce: bool = True, orient: str | None = None,
):
    """Backward blend, ``gbatch`` tiles per Pallas program. Same contract
    (and bit-identical gradients) as pallas_blend.blend_backward_pallas."""
    _check_sub(chunk)
    if orient is None:
        orient = _os.environ.get("RADEGS_BWD_ORIENT", "nm")
    assert orient in ("mn", "nm"), orient
    xy = inputs[0]
    P = xy.shape[0]
    B = binning.gauss_id.shape[0]
    tiles_x, tiles_y = tile_grid(width, height, tile)
    T = tiles_x * tiles_y
    px = tile * tile
    NP = (T + gbatch - 1) // gbatch
    Tp = NP * gbatch

    feat_sorted = _pad_lanes(
        packed_or_sorted_features(
            binning, inputs,
            seg_rows=PACK_SEG if binning.gauss_id.shape[0] > PACK_SEG else None),
        chunk)  # (32, B')

    B_out = ((B + chunk - 1) // chunk) * chunk + chunk

    def rows3(x):
        return x.transpose(1, 0, 2)

    def row1(x):
        return x[:, None, :]

    med_bits = jax.lax.bitcast_convert_type(
        fwd_out["med_pos"].astype(jnp.int32), jnp.float32
    )
    aux = jnp.concatenate(
        [
            rows3(cot["color_raw"]), row1(cot["weight"]), row1(cot["dist_raw"]),
            rows3(cot["coord_raw"]), rows3(cot["normal_raw"]),
            row1(cot["t_final"]), row1(cot["med_t"]), rows3(cot["med_coord"]),
            rows3(fwd_out["color_raw"]), row1(fwd_out["weight"]),
            row1(fwd_out["dist_raw"]), rows3(fwd_out["coord_raw"]),
            rows3(fwd_out["normal_raw"]), row1(fwd_out["t_final"]),
            row1(med_bits),
            jnp.zeros((T, N_AUX - 29, px), jnp.float32),
        ],
        axis=1,
    )
    aux = _pad_tiles(aux, Tp)
    start_p = _pad_tiles(binning.tile_start, Tp)
    count_p = _pad_tiles(binning.tile_count, Tp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((gbatch, N_AUX, px), lambda p, s, c: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, N_FEAT, chunk), jnp.float32),
            pltpu.VMEM((N_FEAT, min(SUB, chunk)), jnp.float32),
            pltpu.VMEM((N_GRAD_PAD, 2 * chunk), jnp.float32),
            pltpu.VMEM((2, N_GRAD_PAD, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    grad_inst = pl.pallas_call(
        functools.partial(
            _bwd_kernel_mt, chunk=chunk, tiles_x=tiles_x, tile=tile,
            width=width, height=height, gbatch=gbatch, orient=orient,
        ),
        out_shape=jax.ShapeDtypeStruct((N_GRAD_PAD, B_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start_p, count_p, feat_sorted, aux)

    if not reduce:
        return {"raw": grad_inst}

    total_rows = jnp.sum(binning.tile_count)
    total = ((total_rows + chunk - 1) // chunk) * chunk
    acc = _reduce_grad_rows(grad_inst, total, P)

    return dict(
        xy=acc[0:2].T,
        xy_abs=jnp.stack([acc[2], jnp.zeros_like(acc[2])], axis=-1),
        conic=acc[3:6].T,
        opacity=acc[6],
        rgb=acc[7:10].T,
        view_point=acc[10:13].T,
        camera_plane=jnp.stack([acc[13:16].T, acc[16:19].T], axis=-1),
        ray_plane=acc[19:21].T,
        normal=acc[21:24].T,
        ts=acc[24],
    )

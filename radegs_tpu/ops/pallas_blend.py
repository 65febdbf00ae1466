"""Pallas TPU forward blend kernel — the hot rasterization loop.

The XLA scan path (ops/rasterize.py) must process the full static per-tile
capacity K for every tile; this kernel is the CUDA-style work-proportional
version (forward.cu:428-693): grid over image tiles, each program walks ONLY
its tile's ``count`` instances from the depth-sorted flat instance list
(ops/binning.py), streaming them through VMEM with double-buffered DMA.

Layout decisions (see pallas_guide):
- instance features are pre-gathered once in XLA into a (24, B) array —
  feature rows on sublanes, instances on lanes — ONE (P,25) row gather +
  transpose; B-sized scalar scatters/lane-gathers are the TPU slow paths.
- the kernel reads each tile's run via 128-ALIGNED WINDOW DMAs directly
  from the sorted array: the window [align_down(start), align_up(start +
  count)) is streamed in CH-chunks and rows outside [start, start+count)
  are masked in-kernel. No padded re-layout of the instance list exists
  (an earlier design materialized a (24, B + T*CH) aligned copy; the
  scatter+gather to build it cost more than the kernel itself).
- all per-chunk compute is (CH, 256): CH instances on sublanes, the tile's
  16x16 pixels on lanes.
- per-pixel sequential front-to-back blending is replaced by a log2(CH)-step
  shifted-multiply cumulative product of (1 - alpha) — exactly the math of
  ops/blend_math; cross-contributor reductions ride the MXU (see _mm).
- the BACKWARD's per-instance gradient rows are written to a per-tile
  chunk-aligned output layout (out_start) — output windows may not overlap
  across sequential grid steps, unlike input reads.

Outputs per tile: 17 channels x 256 px:
  [0:3] color, [3] weight, [4] dist, [5:8] coord, [8:11] normal,
  [11] med_t, [12:15] med_coord, [15] t_final, [16] med_pos (int32 bits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radegs_tpu.ops.binning import TileBinning, tile_grid

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.99

N_FEAT = 32  # 24 attribute rows + gaussian id (row 24) + pad to 8-multiple
# (DMA slice shapes must be sublane-aligned: 25 rows crashes Mosaic)
import os as _os0

# compute sub-block rows inside a 128-row DMA chunk: smaller skips more
# masked boundary work but pays more cond/matmul-granularity overhead.
# Must divide the chunk size (asserted in _check_sub at kernel build):
# `for s in range(CH // SUBK)` would silently skip CH % SUBK trailing rows.
SUB = int(_os0.environ.get("RADEGS_SUB", "128"))

# backward compaction-ring placement: "roll" = one dynamic lane rotate
# (pltpu.roll); "mxu" = the one-hot HIGHEST-precision matmul it replaced
# (kept as a fallback — flip via env if a Mosaic version rejects the roll)
_RING_IMPL = _os0.environ.get("RADEGS_RING_IMPL", "roll")

def _check_sub(chunk: int) -> None:
    subk = min(SUB, chunk)
    if chunk % subk != 0:
        raise ValueError(
            f"RADEGS_SUB={SUB} does not divide chunk={chunk}; the sub-block "
            f"loop would silently drop the trailing {chunk % subk} rows of "
            "every DMA window. Pick a divisor of the chunk size."
        )
N_OUT = 17
# feature row indices in the packed (25, B) array
FEAT_LAYOUT = dict(
    xy=(0, 2), conic=(2, 5), opacity=(5, 6), rgb=(6, 9), ts=(9, 10),
    ray_plane=(10, 12), view_point=(12, 15), camera_plane_x=(15, 18),
    camera_plane_y=(18, 21), normal=(21, 24), gid=(24, 25),
)


def pack_features(xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts):
    """(P, k) attributes -> (24, P) packed rows (lane-friendly layout)."""
    rows = [
        xy.T,              # 0:2
        conic.T,           # 2:5
        opacity[None, :],  # 5
        rgb.T,             # 6:9
        ts[None, :],       # 9
        ray_plane.T,       # 10:12
        view_point.T,      # 12:15
        camera_plane[:, :, 0].T,  # 15:18
        camera_plane[:, :, 1].T,  # 18:21
        normal.T,          # 21:24
    ]
    return jnp.concatenate(rows, axis=0)


def _pad_lanes(x, chunk: int):
    """Pad the last dim up to a multiple of ``chunk`` so the final aligned
    window DMA never reads out of bounds (a no-op for power-of-two budgets
    >= chunk; only tiny test budgets actually pad)."""
    B = x.shape[-1]
    Bp = ((B + chunk - 1) // chunk) * chunk
    if Bp == B:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)])


PACK_SEG = int(_os0.environ.get("RADEGS_PACK_SEG", str(1 << 21)))


def feature_rows(inputs):
    """(P, 24) per-gaussian feature rows in FEAT_LAYOUT column order — the
    table the pack gathers from, and the ``features`` argument of
    binning.bin_gaussians when the pack rides the tile sort."""
    xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts = inputs
    op = opacity[:, 0] if opacity.ndim == 2 else opacity
    return jnp.concatenate(
        [
            xy, conic, op[:, None], rgb, ts[:, None], ray_plane, view_point,
            camera_plane[:, :, 0], camera_plane[:, :, 1], normal,
        ],
        axis=1,
    )


def packed_or_sorted_features(binning: TileBinning, inputs, seg_rows=None):
    """The (32, Bs) kernel feature block: the pack that rode the binning
    sort when available (binning.feat_pack), else the legacy post-sort
    random-id gather."""
    if binning.feat_pack is not None:
        return binning.feat_pack
    return sorted_features(binning, inputs, seg_rows=seg_rows)


def sorted_features(binning: TileBinning, inputs, seg_rows: int | None = None):
    """(32, B) features of the depth-sorted instance list: (P,24) row
    gathers by gauss_id + transpose. (A lane-axis take along a (24, B) array
    or a B-sized scatter both hit ~10x slower TPU paths.)

    Row 24 carries the gaussian id as float (-1 for unused slots; exact for
    id < 2^23): the backward kernel streams it through and re-emits it with
    each gradient row, so the instance->gaussian reduction needs no
    B-sized id gather at all.

    ``seg_rows``: run the gather per segment under ``lax.cond`` so segments
    entirely past the live prefix (real rows + interleaved sentinels) cost
    nothing — the pack then prices at the REAL instance count, not the
    budget (the dense breakdown measured the monolithic pack at ~300 ms of
    which ~half was dead budget slots). Dead segments stay all-zero
    (gid row 0.0, not -1): the kernels never read past each tile's count,
    and culled rows sort past the live prefix. None = monolithic."""
    xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts = inputs
    P = xy.shape[0]
    op = opacity[:, 0] if opacity.ndim == 2 else opacity
    rows = jnp.concatenate(
        [
            xy, conic, op[:, None], rgb, ts[:, None], ray_plane, view_point,
            camera_plane[:, :, 0], camera_plane[:, :, 1], normal,
        ],
        axis=1,
    )  # (P, 24)
    gid = binning.gauss_id
    B = gid.shape[0]

    def pack_block(g):
        n = g.shape[0]
        f = rows[jnp.clip(g, 0, P - 1)]  # (n, 24)
        # zero rows of unused slots (their opacity would otherwise be a
        # real gaussian's — the kernels mask by count, defense in depth)
        f = jnp.where((g >= 0)[:, None], f, 0.0)
        return jnp.concatenate(
            [f, g.astype(jnp.float32)[:, None],
             jnp.zeros((n, N_FEAT - 25), jnp.float32)],
            axis=1,
        ).T  # (N_FEAT, n)

    if seg_rows is None or B <= seg_rows:
        return pack_block(gid)

    # live prefix bound: every non-culled real row + all T sentinels sit
    # before min(n_instances, budget) + T in the sorted order (culled rows
    # carry tid = num_tiles and sort to the very end)
    T = binning.tile_start.shape[0]
    n_live = jnp.minimum(binning.n_instances, B - T) + T
    out = jnp.zeros((N_FEAT, B), jnp.float32)
    for s0 in range(0, B, seg_rows):
        s1 = min(s0 + seg_rows, B)

        def seg(o, s0=s0, s1=s1):
            return jax.lax.dynamic_update_slice(
                o, pack_block(gid[s0:s1]), (0, s0))

        if s0 == 0:
            out = seg(out)
        else:
            out = jax.lax.cond(s0 < n_live, seg, lambda o: o, out)
    return out


def _shift_down(x, sh, fill):
    """Shift rows down by sh along axis 0, filling the top with ``fill``."""
    top = jnp.full((sh,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[:-sh]], axis=0)


def _cumprod0(x, n: int):
    """Inclusive cumulative product along axis 0 (length n, power of two)."""
    sh = 1
    while sh < n:
        x = x * _shift_down(x, sh, 1.0)
        sh *= 2
    return x


def _cumor0(x, n: int):
    """Inclusive cumulative OR along axis 0 (bool in/out, length n).
    Runs as a float max-scan: Mosaic cannot concat i1 vectors."""
    f = jnp.where(x, 1.0, 0.0)
    sh = 1
    while sh < n:
        f = jnp.maximum(f, _shift_down(f, sh, 0.0))
        sh *= 2
    return f > 0.5


import os as _os

# f32 fidelity of the in-kernel matmuls. DEFAULT truncates operands to
# bf16 (1 MXU pass); HIGH ~ 3 passes; HIGHEST ~ 6 passes. These products
# feed rendered outputs and gradients; see tests/test_pallas_blend for the
# measured parity at each setting.
_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("RADEGS_MM_PRECISION", "highest").lower()]


def _mm(a, b, precision=None):
    """(k, CH) @ (CH, px) on the MXU with pinned f32 fidelity."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION if precision is None else precision,
    )


def _lower_tri(ch: int):
    """(CH, CH) inclusive lower-triangular ones (f32)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return (r >= c).astype(jnp.float32)


def _cumor0_mxu(term_f, tri):
    """Inclusive cumulative OR via one MXU matmul: counts of prior (or own)
    terminators = L @ term_f; 0/1 operands and counts <= CH are exact even
    in the default bf16 matmul path."""
    counts = _mm(tri, term_f, precision=jax.lax.Precision.DEFAULT)
    return counts > 0.5


def _fwd_kernel(
    # scalar prefetch
    start_ref, count_ref,
    # inputs
    feat_hbm,
    # outputs
    out_ref,
    # scratch
    fbuf, subbuf, sems,
    *, chunk: int, tiles_x: int, tile: int,
):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    CH = chunk
    px = tile * tile
    SUBK = min(SUB, CH)  # sub-block size (tests use tiny chunks)

    tx = t % tiles_x
    ty = t // tiles_x
    # TILE-LOCAL pixel coordinates: all per-pixel/per-contributor positions
    # are shifted by the tile origin so the affine-basis matmul below does
    # not cancel 1600-scale coordinates against 16-scale deltas
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    pix_x = (lane % tile).astype(jnp.float32)  # 0..tile-1
    pix_y = (lane // tile).astype(jnp.float32)
    ox = (tx * tile).astype(jnp.float32)
    oy = (ty * tile).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (SUBK, 1), 0)
    tri = _lower_tri(SUBK)

    # 128-aligned WINDOW read of the sorted instance list: rows before
    # ``head`` (previous tiles') and past head+count are masked in-kernel
    start_al = (start // CH) * CH
    head = start - start_al
    count_w = head + count
    n_chunks = jnp.where(count > 0, pl.cdiv(count_w, CH), 0)

    def dma(slot, ci):
        off = pl.multiple_of(start_al + ci * CH, CH)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, CH)],
            fbuf.at[slot],
            sems.at[slot],
        )

    # chunk 0 was prefetched by the PREVIOUS grid step (cross-tile
    # speculative prefetch: most tiles run a single chunk, so an entry-time
    # start here would leave every tile stalled on its first DMA's latency);
    # only the very first non-empty tile starts its own.
    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        dma(0, 0).start()

    f32 = jnp.float32
    zeros = lambda: jnp.zeros((1, px), f32)
    init = dict(
        t_cur=jnp.ones((1, px), f32),
        done=jnp.zeros((1, px), jnp.float32),  # 0/1 mask (bool carries fail to legalize)
        c_r=zeros(), c_g=zeros(), c_b=zeros(),
        wsum=zeros(), dist=zeros(),
        x0=zeros(), x1=zeros(), x2=zeros(),
        n0=zeros(), n1=zeros(), n2=zeros(),
        med_t=zeros(), m0=zeros(), m1=zeros(), m2=zeros(),
        med_pos=jnp.full((1, px), -1, jnp.int32),
    )

    def sub_step(f_sub, row0, acc):
        """Process SUBK contributors (rows of the window at offset row0)."""
        ft = f_sub.T  # (SUBK, 32)

        def col(i):
            return ft[:, i][:, None]  # (SUBK, 1)

        def frow(i):
            return f_sub[i : i + 1, :]  # (1, SUBK)

        idx = row0 + srow  # (SUBK, 1) window-relative index
        in_range = (idx >= head) & (idx < count_w)
        xl = col(0) - ox  # tile-local gaussian center
        yl = col(1) - oy
        dx = xl - pix_x  # (SUBK, px) — same value as global-frame delta
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

        # Every accumulated quantity is per-contributor-affine in the pixel
        # position: t_ray = A_t - B_t px - C_t py (likewise the 3 coord
        # channels), and rgb/normal/weight are per-contributor constants. So
        # the 11 per-pixel reductions sum_i w_i x_i (forward.cu:596-611)
        # collapse to ONE MXU matmul of a 19-row contributor basis against w
        # (the VPU cross-sublane reduce trees were ~half this kernel's time):
        xr, yr = frow(0) - ox, frow(1) - oy  # (1, SUBK) tile-local centers
        a_t = frow(9) + frow(10) * xr + frow(11) * yr
        a_cx = frow(12) + frow(15) * xr + frow(18) * yr
        a_cy = frow(13) + frow(16) * xr + frow(19) * yr
        a_cz = frow(14) + frow(17) * xr + frow(20) * yr
        # affine triples FIRST so the median matmul can slice basis[:12]
        # at sublane offset 0 (Mosaic: concat/slice operands need aligned
        # layout offsets)
        basis = jnp.concatenate(
            [
                a_t, frow(10), frow(11),  # t_ray affine coefs
                a_cx, frow(15), frow(18),
                a_cy, frow(16), frow(19),
                a_cz, frow(17), frow(20),
                frow(6), frow(7), frow(8),  # rgb
                jnp.ones((1, SUBK), f32),  # weight
                frow(21), frow(22), frow(23),  # normal
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

        # median: last include-contributor with T > 0.5 (forward.cu:580,603);
        # the 4 picked values ride the same affine basis with the one-hot
        # selector as weights
        pos = idx - head  # contributor index within the tile's run
        med_mask = include & (t_prefix > 0.5)
        cand_pos = jnp.where(med_mask, pos + jnp.zeros_like(dx, jnp.int32), -1)
        chunk_med = jnp.max(cand_pos, axis=0, keepdims=True)  # (1, px)
        has = chunk_med >= 0
        sel = jnp.where(med_mask & (cand_pos == chunk_med), 1.0, 0.0)
        S = _mm(basis[:12], sel)  # (12, px)

        acc["med_t"] = jnp.where(has, affine(S, 0), acc["med_t"])
        acc["m0"] = jnp.where(has, affine(S, 3), acc["m0"])
        acc["m1"] = jnp.where(has, affine(S, 6), acc["m1"])
        acc["m2"] = jnp.where(has, affine(S, 9), acc["m2"])
        acc["med_pos"] = jnp.where(has, chunk_med, acc["med_pos"])

        # T update without a second masked cumprod: the first terminator's
        # t_prefix (which excludes it and everything after) IS the new T
        t_term = jnp.max(jnp.where(terminate, t_prefix, 0.0), axis=0, keepdims=True)
        any_term = jnp.max(jnp.where(terminate, 1.0, 0.0), axis=0, keepdims=True)
        t_open = acc["t_cur"] * cum[SUBK - 1 : SUBK]
        t_new = jnp.where(any_term > 0.5, t_term, t_open)
        acc["t_cur"] = jnp.where(acc["done"] > 0.5, acc["t_cur"], t_new)
        acc["done"] = jnp.maximum(acc["done"], any_term)
        return acc

    def body(ci, acc):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(1 - slot, ci + 1).start()

        dma(slot, ci).wait()
        f = fbuf[slot]  # (32, CH): feature ROWS, instance lanes

        # early termination (forward.cu:568-573 analogue at chunk
        # granularity): once every pixel's transmittance closed, the
        # remaining chunks contribute nothing — skip their compute (DMAs
        # stay unconditional; they are not the cost)
        active = jnp.min(acc["done"]) < 0.5

        # sub-stepped compute: fully-masked sub-blocks of the window are
        # skipped outright
        for s in range(CH // SUBK):
            row0 = ci * CH + s * SUBK
            overlap = active & (row0 + SUBK > head) & (row0 < count_w)
            # scratch roundtrip: normalizes the sub-slice's lane offset to 0
            # (Mosaic rejects concat operands with nonzero minor offsets)
            subbuf[...] = f[:, s * SUBK : (s + 1) * SUBK]
            fs = subbuf[...]
            acc = jax.lax.cond(
                overlap,
                lambda a, fs=fs, row0=row0: sub_step(fs, row0, a),
                lambda a: a,
                acc,
            )
        return acc

    acc = jax.lax.fori_loop(0, n_chunks, body, init)

    # speculative prefetch of the NEXT tile's first chunk: every input DMA
    # of this tile has been consumed by now (each body waits its own chunk),
    # so slot 0 is free; the next grid step's body(0) waits the matching
    # semaphore instead of paying the latency cold. Empty next tiles start
    # nothing (they run no body) and hand the prefetch duty one tile on.
    nt = t + 1

    @pl.when(nt < pl.num_programs(0))
    def _():
        ncount = count_ref[nt]

        @pl.when(ncount > 0)
        def _():
            noff = pl.multiple_of((start_ref[nt] // CH) * CH, CH)
            pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(noff, CH)], fbuf.at[0], sems.at[0]
            ).start()

    out = jnp.concatenate(
        [
            acc["c_r"], acc["c_g"], acc["c_b"], acc["wsum"], acc["dist"],
            acc["x0"], acc["x1"], acc["x2"], acc["n0"], acc["n1"], acc["n2"],
            acc["med_t"], acc["m0"], acc["m1"], acc["m2"], acc["t_cur"],
            pltpu.bitcast(acc["med_pos"], jnp.float32),
        ],
        axis=0,
    )  # (17, px)
    out_ref[0] = out


def aligned_instance_layout(binning: TileBinning, num_tiles: int, chunk: int):
    """Re-lay the depth-sorted flat instance list so every tile's run starts
    at a chunk-aligned offset (TPU DMA lane slices must be 128-aligned).
    Returns (gauss_id_aligned (B_pad,), aligned_start (T,)); pad slots are -1
    and always sit at ranks >= tile_count (masked by the kernel's in_range).
    """
    B = binning.gauss_id.shape[0]
    T = num_tiles
    B_pad = B + T * chunk  # worst case: every tile padded by < chunk

    padded = ((binning.tile_count + chunk - 1) // chunk) * chunk
    astart = (jnp.cumsum(padded) - padded).astype(jnp.int32)

    tid = jnp.clip(binning.tile_id, 0, T - 1)
    # one packed row gather (B-sized scalar gathers are ~20ms each on TPU)
    pk = jnp.stack([binning.tile_start, binning.tile_count, astart], axis=1)[tid]
    r = jnp.arange(B, dtype=jnp.int32) - pk[:, 0]
    ok = (binning.tile_id < T) & (r >= 0) & (r < pk[:, 1])
    dest = jnp.where(ok, pk[:, 2] + r, B_pad)
    gid_aligned = (
        jnp.full((B_pad + 1,), -1, jnp.int32).at[dest].set(binning.gauss_id)[:B_pad]
    )
    return gid_aligned, astart


@functools.partial(jax.jit, static_argnames=("width", "height", "tile", "chunk", "interpret"))
def blend_forward_pallas(
    binning: TileBinning,
    xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts,
    *, width: int, height: int, tile: int = 16, chunk: int = 128, interpret: bool = False,
):
    """Forward blend via the Pallas kernel. Returns the same raw-accumulator
    dict as ops.rasterize._blend_forward_scan (channels-leading)."""
    _check_sub(chunk)
    tiles_x, tiles_y = tile_grid(width, height, tile)
    T = tiles_x * tiles_y
    px = tile * tile

    inputs = (xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts)
    feat_sorted = _pad_lanes(
        packed_or_sorted_features(
            binning, inputs,
            seg_rows=PACK_SEG if binning.gauss_id.shape[0] > PACK_SEG else None),
        chunk)  # (32, B')

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, N_OUT, px), lambda t, s, c: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, N_FEAT, chunk), jnp.float32),
            pltpu.VMEM((N_FEAT, min(SUB, chunk)), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, tiles_x=tiles_x, tile=tile),
        out_shape=jax.ShapeDtypeStruct((T, N_OUT, px), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(binning.tile_start, binning.tile_count, feat_sorted)

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

N_GRAD = 25  # per-instance gradient rows, padded to 32 for the HBM write
N_GRAD_PAD = 32
# grad row layout: 0:2 xy, 2 xy_abs, 3:6 conic, 6 opacity, 7:10 rgb,
# 10:13 view_point, 13:16 camera_plane[:, :, 0], 16:19 camera_plane[:, :, 1],
# 19:21 ray_plane, 21:24 normal, 24 ts


def _cumsum0(x, n: int):
    """Inclusive cumulative sum along axis 0 (length n, power of two)."""
    sh = 1
    while sh < n:
        x = x + _shift_down(x, sh, 0.0)
        sh *= 2
    return x


# aux row layout (cotangents + forward totals packed per tile):
# 0:3 g_c, 3 g_w, 4 g_d, 5:8 g_x, 8:11 g_n, 11 g_tf, 12 g_mt, 13:16 g_mx,
# 16:19 tot_c, 19 tot_w, 20 tot_d, 21:24 tot_x, 24:27 tot_n, 27 t_final,
# 28 med_pos (int32 bits)
N_AUX = 32


def _bwd_kernel(
    # scalar prefetch
    start_ref, count_ref,
    # inputs: packed instance features (HBM) + per-tile aux block (VMEM)
    feat_hbm,
    aux_ref,
    # output: per-instance gradient rows, GLOBALLY COMPACTED — a VMEM ring
    # (persisting across the sequential grid) collects only the real rows of
    # every tile and flushes exact 128-lane chunks, so the downstream
    # scatter-add sees ~sum(count) rows instead of sum(count) + T*CH pad
    grad_hbm,
    # scratch
    fbuf, subbuf, stage, flbuf, fsems, flsems, fill_smem,
    *, chunk: int, tiles_x: int, tile: int, width: int, height: int,
    orient: str = "mn",
):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    CH = chunk
    px = tile * tile
    SUBK = min(SUB, CH)  # sub-block size (tests use tiny chunks)
    RING = 2 * CH

    tx_i = t % tiles_x
    ty_i = t // tiles_x
    # tile-local coordinates (see _fwd_kernel): keeps the affine-basis
    # matmuls cancellation-free
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    pix_x = (lane % tile).astype(jnp.float32)
    pix_y = (lane // tile).astype(jnp.float32)
    ox = (tx_i * tile).astype(jnp.float32)
    oy = (ty_i * tile).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (SUBK, 1), 0)
    tri = _lower_tri(SUBK)

    start_al = (start // CH) * CH
    head = start - start_al
    count_w = head + count
    n_chunks = jnp.where(count > 0, pl.cdiv(count_w, CH), 0)

    def fdma(slot, ci):
        off = pl.multiple_of(start_al + ci * CH, CH)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, CH)], fbuf.at[slot], fsems.at[slot]
        )

    @pl.when(t == 0)
    def _():
        fill_smem[0] = 0  # global compacted-row counter (across grid steps)

    def fl_dma(slot, k):
        # flush k covers output lanes [k*CH, (k+1)*CH)
        off = pl.multiple_of(k * CH, CH)
        return pltpu.make_async_copy(
            flbuf.at[slot], grad_hbm.at[:, pl.ds(off, CH)], flsems.at[slot]
        )

    def flush(k):
        """Copy the completed ring half to a flush buffer and DMA it out."""
        slot = jax.lax.rem(k, 2)

        @pl.when(k >= 2)
        def _():
            fl_dma(slot, k - 2).wait()

        half = jax.lax.rem(k, 2)  # ring half k%2 holds lanes [k*CH,(k+1)*CH)
        flbuf[slot] = stage[:, pl.ds(pl.multiple_of(half * CH, CH), CH)]
        fl_dma(slot, k).start()

    # ring-lane index grids for the masked placement
    ring_lane = jax.lax.broadcasted_iota(jnp.int32, (1, RING), 1)
    sub_j = jax.lax.broadcasted_iota(jnp.int32, (SUBK, RING), 0)
    ring_r = jax.lax.broadcasted_iota(jnp.int32, (SUBK, RING), 1)

    def stage_put(gmat_t, lo, nreal, fill):
        """Place gmat_t columns [lo, lo+nreal) at ring lanes [fill%RING, ...).

        ``gmat_t`` is (N_GRAD_PAD, SUBK): gradient channels on sublanes,
        contributors on lanes (the "nm" orientation produces it directly;
        "mn" transposes at the call site)."""
        fill_mod = jax.lax.rem(fill, RING)
        written = jax.lax.rem(ring_lane - fill_mod + RING, RING) < nreal
        if _RING_IMPL == "roll":
            # lane ROTATION: source lane j (gmat_t column j) lands on ring
            # lane (j + shift) mod RING with shift = fill_mod - lo, so
            # columns [lo, lo+nreal) hit exactly the ``written`` lanes; all
            # other source lanes (rows outside the real range + the zero
            # pad) land outside ``written`` and are discarded by the select.
            # Replaces a 6-pass one-hot MXU matmul with one vector rotate.
            padded = jnp.concatenate(
                [gmat_t, jnp.zeros((N_GRAD_PAD, RING - SUBK), jnp.float32)],
                axis=1,
            )  # (32, RING)
            shift = jax.lax.rem(fill_mod - lo + RING, RING)
            add = pltpu.roll(padded, shift, 1)
        else:
            # placement one-hot: lane r takes gmat_t column j iff
            # (r - fill_mod) mod RING == j - lo and lo <= j < lo + nreal.
            # HIGHEST: the f32 gradient VALUES must survive the matmul
            # (DEFAULT would round them to bf16; the one-hot side is exact
            # in any precision).
            rel = jax.lax.rem(ring_r - fill_mod + RING, RING)
            sp = jnp.where(
                (rel == sub_j - lo) & (sub_j >= lo) & (sub_j < lo + nreal), 1.0, 0.0
            )  # (SUBK, RING)
            add = jax.lax.dot_general(
                gmat_t, sp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (32, RING)
        stage[...] = jnp.where(written, add, stage[...])

    # chunk 0 was prefetched by the previous grid step (see _fwd_kernel's
    # cross-tile speculative prefetch); only the first tile starts its own
    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        fdma(0, 0).start()

    # per-tile cotangents / totals, each (1, px), from the packed aux block
    def a(k):
        return aux_ref[0, k : k + 1, :]

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

    f32 = jnp.float32
    zrow = lambda: jnp.zeros((1, px), f32)
    # the cotangents are constant per pixel across contributors, so the 11
    # per-channel prefix sums collapse to ONE prefix of w_i * dL/dw_i:
    #   sum_ch cot_ch * prefix_i(w x_ch) = prefix_i(w_i * sum_ch cot_ch x_ch,i)
    s_tot = gw * tw + gd * td
    for k in range(3):
        s_tot = s_tot + gc[k] * tc[k] + gn[k] * tn[k] + gx[k] * txx[k]
    init = dict(t_cur=jnp.ones((1, px), f32), done=zrow(), pre_dot=zrow())

    # per-pixel cotangent bank for the MXU reduction (see body): the 25
    # per-contributor sums become one matmul against these 16 columns.
    # orient="mn": (14*SUBK, px) @ (px, 16) — N pads 16 -> 128 lanes, so the
    # MXU streams 14*SUBK rows at 1/8 lane utilization. orient="nm" flips
    # it: (16, px) @ (px, 14*SUBK) — 16 rows stream against fully-used
    # 448-lane tiles (~7x fewer row passes) and the result lands directly
    # in the (channels, contributors) orientation the compaction ring wants.
    vbank_rows = jnp.concatenate(
        gc + gn + gx + gmx + [gd, gmt, jnp.ones((1, px), f32), zrow()], axis=0
    )  # (16, px)
    vbank = vbank_rows.T if orient == "mn" else vbank_rows
    GC0, GN0, GX0, GMX0, GD, GMT, ONE = 0, 3, 6, 9, 12, 13, 14

    # per-pixel bank for the dL/dw matmul (constant across chunks): row k of
    # this matches row k of the per-chunk contributor basis, so
    # dL/dw = basis^T @ dw_bank (the direct-path sum backward.cu:737-762)
    dw_bank = jnp.concatenate(
        [gd, -pix_x * gd, -pix_y * gd]
        + [v for k in range(3) for v in (gx[k], -pix_x * gx[k], -pix_y * gx[k])]
        + gc
        + [gw]
        + gn,
        axis=0,
    )  # (19, px) — row order matches the kernels' affine-first basis

    # a sub-block skipped entirely (no real rows) emits zero grads + gid -1
    if orient == "mn":
        skip_gmat = jnp.concatenate(
            [jnp.zeros((SUBK, N_GRAD), f32), jnp.full((SUBK, 1), -1.0, f32),
             jnp.zeros((SUBK, N_GRAD_PAD - N_GRAD - 1), f32)], axis=1)
    else:
        _grow = jax.lax.broadcasted_iota(jnp.int32, (N_GRAD_PAD, SUBK), 0)
        skip_gmat = jnp.where(_grow == N_GRAD, -1.0, 0.0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, SUBK), 1)

    def sub_step(f_sub, row0, acc):
        ft = f_sub.T  # (SUBK, 32)

        def col(i):
            return ft[:, i][:, None]

        def frow(i):
            return f_sub[i : i + 1, :]  # (1, SUBK)

        idx = row0 + srow  # window-relative index
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

        # dL/dw (the direct path, backward.cu:737-762): every term is
        # (per-contributor coef) x (pixel-basis x cotangent), so the whole
        # sum is ONE matmul of the 19-row affine basis against dw_bank
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
        )  # (19, SUBK) — affine-first order, matches dw_bank
        dL_dw = _mm(basis.T, dw_bank)  # (SUBK, px)

        # inclusive prefix of w*dL/dw via the triangular MXU matmul
        pdot = acc["pre_dot"] + _mm(tri, w * dL_dw)  # (SUBK, px)
        suffix = (s_tot - pdot) + gtf * tf
        dL_dalpha = jnp.where(include, t_prefix * dL_dw - suffix / one_minus, 0.0)

        # median routing (backward.cu:909-936)
        pos = (idx - head) + jnp.zeros((SUBK, px), jnp.int32)
        is_med = include & (pos == mp)
        is_med_f = jnp.where(is_med, 1.0, 0.0)

        unclipped = (raw < MAX_ALPHA) & include
        dL_draw = jnp.where(unclipped, dL_dalpha, 0.0)
        dL_dG = dL_draw * col(5)

        gdx, gdy = falloff * dx, falloff * dy
        e_x = dL_dG * (-gdx * ca - gdy * cb)  # dL_dG * dG/ddelx
        e_y = dL_dG * (-gdy * cc - gdx * cb)

        # all 25 per-contributor pixel reductions as ONE MXU matmul: each is
        # a dot of one of 14 (SUBK, px) matrices against a per-pixel cotangent
        # column from vbank (cross-lane VPU reduce trees are ~half the kernel)
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
        # DEFAULT precision deliberately: operands round to bf16 but
        # ACCUMULATION stays f32, so each 256-px gradient sum carries
        # ~0.03% relative error (0.4%/sqrt(256)) — far below gradient
        # noise — while HIGHEST would 6x the dominant MXU cost.
        if orient == "mn":
            # (14*SUBK, px) @ (px, 16): N pads 16 -> 128 (1/8 utilized)
            R = _mm(M, vbank, precision=jax.lax.Precision.DEFAULT)

            def r(b, c):
                return R[b * SUBK : (b + 1) * SUBK, c : c + 1]  # (SUBK, 1)

            sc = col  # per-contributor scalars as (SUBK, 1) columns
        else:
            # (16, px) contracted with (14*SUBK, px) on px: full-width
            # 448-lane result tiles, 16 streamed rows, and R already sits
            # in the (channel, contributor) orientation of the ring
            R = jax.lax.dot_general(
                vbank, M, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (16, 14*SUBK)

            def r(b, c):
                return R[c : c + 1, b * SUBK : (b + 1) * SUBK]  # (1, SUBK)

            sc = frow  # per-contributor scalars as (1, SUBK) rows

        out_t = r(0, GD) + r(3, GMT)  # red(dL_dt)
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
        # row/col 25: the gaussian id (streamed through the feature pack)
        # for the instance->gaussian reduction; -1 for masked window rows
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

        # carries: the first terminator's t_prefix IS the new T (it excludes
        # itself and everything after), so no second masked cumprod is needed
        t_term = jnp.max(jnp.where(terminate, t_prefix, 0.0), axis=0, keepdims=True)
        any_term = jnp.max(jnp.where(terminate, 1.0, 0.0), axis=0, keepdims=True)
        t_open = acc["t_cur"] * cum[SUBK - 1 : SUBK]
        t_new = jnp.where(any_term > 0.5, t_term, t_open)
        acc["t_cur"] = jnp.where(acc["done"] > 0.5, acc["t_cur"], t_new)
        acc["done"] = jnp.maximum(acc["done"], any_term)
        acc["pre_dot"] = pdot[SUBK - 1 : SUBK]
        return acc, gmat

    def body(ci, acc):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            fdma(1 - slot, ci + 1).start()

        fdma(slot, ci).wait()
        f = fbuf[slot]  # (32, CH)

        # sub-stepped compute (see _fwd_kernel); only REAL rows [lo, hi) of
        # each sub-block enter the global compaction ring
        # early termination: once all pixels closed, remaining instances get
        # zero gradients — emit gid=-1 ring rows without the math
        active = jnp.min(acc["done"]) < 0.5

        for s in range(CH // SUBK):
            row0 = ci * CH + s * SUBK
            overlap = active & (row0 + SUBK > head) & (row0 < count_w)
            # scratch roundtrip: normalize sub-slice lane offset (see fwd)
            subbuf[...] = f[:, s * SUBK : (s + 1) * SUBK]
            fs = subbuf[...]
            acc, gmat = jax.lax.cond(
                overlap,
                lambda a, fs=fs, row0=row0: sub_step(fs, row0, a),
                lambda a: (a, skip_gmat),
                acc,
            )
            lo = jnp.clip(head - row0, 0, SUBK)
            hi = jnp.clip(count_w - row0, 0, SUBK)
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

        return acc

    jax.lax.fori_loop(0, n_chunks, body, init)

    # speculative prefetch of the next tile's first chunk (see _fwd_kernel)
    nt = t + 1

    @pl.when(nt < pl.num_programs(0))
    def _():
        ncount = count_ref[nt]

        @pl.when(ncount > 0)
        def _():
            noff = pl.multiple_of((start_ref[nt] // CH) * CH, CH)
            pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(noff, CH)], fbuf.at[0], fsems.at[0]
            ).start()

    # final program: pad the open partial chunk with gid=-1 rows, flush it,
    # and wait the last in-flight flushes (DMAs may stay in flight across
    # the sequential grid otherwise)
    @pl.when(t == pl.num_programs(0) - 1)
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


def _reduce_grad_rows(grad_inst, total, P, seg_rows: int | None = None):
    """Instance -> gaussian gradient reduction, (N_GRAD_PAD, B_out) -> (N_GRAD, P).

    Deterministic row-oriented scatter-add (the lane-oriented variant is
    ~10x slower), done per SEGMENT of rows under ``lax.cond`` so segments
    entirely past ``total`` (the compacted row count the kernel actually
    flushed) cost nothing. The budget bounds the PEAK instance count, so
    typically most of B_out is empty padding — the dense-scene breakdown
    measured the monolithic transpose+scatter at 2.29 s of a 3.58 s step
    with ~4.7M real rows in a 16M budget (BENCH_NOTES.md). Cost becomes
    proportional to real rows at 2M-row granularity.
    """
    B_out = grad_inst.shape[1]
    if seg_rows is None:
        seg_rows = 1 << 21
    acc = jnp.zeros((P + 1, N_GRAD), jnp.float32)
    for s0 in range(0, B_out, seg_rows):
        s1 = min(s0 + seg_rows, B_out)

        def scatter_seg(a, s0=s0, s1=s1):
            gq = grad_inst[N_GRAD, s0:s1].astype(jnp.int32)
            qq = jnp.arange(s0, s1, dtype=jnp.int32)
            gs = jnp.where((qq < total) & (gq >= 0) & (gq < P), gq, P)
            return a.at[gs].add(grad_inst[:N_GRAD, s0:s1].T)

        if s0 == 0:
            acc = scatter_seg(acc)  # always at least one real segment
        else:
            acc = jax.lax.cond(s0 < total, scatter_seg, lambda a: a, acc)
    return acc[:P].T


@functools.partial(jax.jit, static_argnames=("width", "height", "tile", "chunk",
                                             "interpret", "reduce", "orient"))
def blend_backward_pallas(
    binning: TileBinning,
    inputs,
    fwd_out,
    cot,
    *, width: int, height: int, tile: int = 16, chunk: int = 128, interpret: bool = False,
    reduce: bool = True, orient: str | None = None,
):
    """Backward blend via the Pallas kernel: per-tile back-walk emitting
    per-instance gradients, reduced to per-Gaussian deterministically
    (replaces backward.cu:631-1016 + atomicAdd).

    The reduction is the segmented XLA row scatter-add (_reduce_grad_rows)
    — chosen by measurement. The round-3/4 sort-based alternatives
    (one-hot MXU segment-sum; shift-add scan) were removed in round 5:
    every graph routing the 26 gradient columns through `lax.sort` — even
    in `sort_grouped` groups of 6 — walls the remote TPU compile at both
    bench scales (four independent one-hour timeouts, BENCH_NOTES round-5
    session B), which also pins the r4 "mxu hang" to the wide-payload
    sort pattern rather than the Pallas kernel.

    ``reduce=False`` returns the raw per-instance gradient block
    {"raw": (N_GRAD_PAD, B_out)} instead — benchmarking hook that isolates
    the kernel from the transpose + segment reduction.

    ``orient``: orientation of the in-kernel 25-way pixel reduction —
    "mn" = (14*SUBK, px) @ (px, 16) (N pads 16 -> 128 lanes), "nm" = the
    transposed (16, px) x (14*SUBK, px) contraction (full 448-lane result
    tiles, ~7x fewer MXU row passes, ring-ready orientation). Bit-identical
    math; None = $RADEGS_BWD_ORIENT or "nm" — the measured default
    (100k bench 15.62M -> 17.65M rays/s, round-5 session B stage 3)."""
    _check_sub(chunk)
    if orient is None:
        orient = _os.environ.get("RADEGS_BWD_ORIENT", "nm")
    assert orient in ("mn", "nm"), orient
    xy, conic, opacity, rgb, view_point, camera_plane, ray_plane, normal, ts = inputs
    P = xy.shape[0]
    B = binning.gauss_id.shape[0]
    tiles_x, tiles_y = tile_grid(width, height, tile)
    T = tiles_x * tiles_y
    px = tile * tile

    feat_sorted = _pad_lanes(
        packed_or_sorted_features(
            binning, inputs,
            seg_rows=PACK_SEG if binning.gauss_id.shape[0] > PACK_SEG else None),
        chunk)  # (32, B')

    # the kernel compacts gradient rows globally (VMEM ring across the
    # sequential grid): written rows = ceil(sum(count)/CH)*CH, bounded by
    B_out = ((B + chunk - 1) // chunk) * chunk + chunk

    # pack cotangents + forward totals into one (T, 32, px) aux block
    # (row layout documented above _bwd_kernel)
    def rows3(x):  # (3, T, px) -> (T, 3, px)
        return x.transpose(1, 0, 2)

    def row1(x):  # (T, px) -> (T, 1, px)
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # feat
            pl.BlockSpec((1, N_AUX, px), lambda t, s, c: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # grad (32, B_out)
        scratch_shapes=[
            pltpu.VMEM((2, N_FEAT, chunk), jnp.float32),
            pltpu.VMEM((N_FEAT, min(SUB, chunk)), jnp.float32),
            pltpu.VMEM((N_GRAD_PAD, 2 * chunk), jnp.float32),  # compaction ring
            pltpu.VMEM((2, N_GRAD_PAD, chunk), jnp.float32),  # flush buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    grad_inst = pl.pallas_call(
        functools.partial(
            _bwd_kernel, chunk=chunk, tiles_x=tiles_x, tile=tile,
            width=width, height=height, orient=orient,
        ),
        out_shape=jax.ShapeDtypeStruct((N_GRAD_PAD, B_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(binning.tile_start, binning.tile_count, feat_sorted, aux)

    if not reduce:
        return {"raw": grad_inst}

    # gaussian ids arrive as gradient row 25 (streamed through the feature
    # pack — no B-sized id gather). Rows past the written chunks (garbage)
    # are masked by q >= total.
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

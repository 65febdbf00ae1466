"""Static-shape tile binning — the TPU replacement for the reference's
dynamic duplicate -> radix-sort -> tile-ranges scheduler
(rasterizer_impl.cu:70-173, 350-391).

XLA needs static shapes, so the GPU design ("allocate num_rendered entries,
radix-sort 64-bit keys") is re-cast as:

1. ``duplicate``: every Gaussian owns a contiguous run of `tiles_touched`
   slots inside a fixed instance budget ``B`` — runs laid out in DEPTH
   order (exclusive prefix sum of tile-rect areas over the depth argsort;
   dead Gaussians own zero-length runs). A stable two-sort MERGE of run
   starts into slot positions recovers, for each slot, the owning Gaussian
   (the legacy scatter-of-ones + cumsum stays behind $RADEGS_BIN_OWNER);
   the slot's offset inside the run enumerates the rect's tiles row-major —
   exactly duplicateWithKeys (rasterizer_impl.cu:70-111) without atomics or
   dynamic allocation.
2. ``sort``: because runs are already depth-ordered, ONE stable single-key
   sort by tile_id alone produces (tile, depth) order — equivalent to the
   reference's 64-bit [tile | float-bits(depth)] radix key
   (rasterizer_impl.cu:102-107). (A two-key lexicographic lax.sort hits
   XLA:TPU's slow multi-operand comparator path; the single-key sort is the
   fast path — measured ~5x at B=16M, scripts/_micro_sort.py.)
3. ``ranges``: per-tile [start, count) via histogram + cumsum —
   identifyTileRanges (rasterizer_impl.cu:151-173).
4. ``gather``: a [T, K] per-tile index matrix (front-to-back order, -1 pad)
   for renderers that prefer rectangular layouts (XLA-scan path only;
   skipped for the Pallas path via ``need_tile_gauss=False``).

Beyond the reference's 3-sigma-circle AABB (forward.cu:399-403), when the
2D conic + opacity are provided the binning applies two exact work cuts
(the blend kernel skips contributors with alpha < 1/255, so any tile whose
best pixel is below that threshold renders identically without them):

- **opacity-aware ellipse AABB**: the alpha >= 1/255 level set
  Q(d) <= tau, tau = 2 ln(255 op), has axis extents sqrt(tau * cov_kk);
  intersected with the reference's 3-sigma radius this shrinks the rect of
  every anisotropic or low-opacity splat (most of them, after opacity
  resets).
- **exact per-tile test**: within the rect, a tile is kept only if
  min_{d in tile} Q(d) <= tau (convex quadratic over a rectangle: the
  minimum is at the center projection or on one of the 4 edges).

Overflow policy ("no silent caps"): if the true instance count exceeds B,
the trailing instances (of the *largest-area* Gaussians' last tiles) are
dropped and ``n_overflow`` reports how many.  Same for per-tile counts
beyond K (``tile_overflow``).
"""

from __future__ import annotations

import os as _os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

TILE = 16
ALPHA_EPS = 1.0 / 255.0


class TileBinning(NamedTuple):
    # flat instance arrays, sorted by (tile, depth):
    gauss_id: Any  # (B,) int32 gaussian index, -1 for unused slots
    tile_id: Any  # (B,) int32, num_tiles for unused slots
    tile_start: Any  # (T,) int32 first instance of each tile
    tile_count: Any  # (T,) int32 instances per tile
    # rectangular per-tile layout (None when need_tile_gauss=False):
    tile_gauss: Any  # (T, K) int32 gaussian ids front-to-back, -1 padded
    n_instances: Any  # () int32 — true duplicate count (pre-clamp, pre-cull)
    n_overflow: Any  # () int32 — instances dropped by the B budget
    tile_overflow: Any  # () int32 — instances dropped by the K cap
    max_tile_count: Any  # () int32
    # permutation metadata (diagnostics; no hot-path consumers):
    sorted_orig: Any  # (B,) int32 expand slot per sorted instance; None
    # unless need_sorted_orig (it would ride the sort as a 3rd column)
    expand_offsets: Any  # (P,) int32 expand-run start per DEPTH-ORDERED gaussian (<= B)
    n_culled: Any  # () int32 — instances removed by the exact tile test
    # fused feature pack (None unless ``features`` was passed): the (32, Bs)
    # blend-kernel input that rode the tile sort as payload columns —
    # replaces the post-sort random-id gather of pallas_blend.sorted_features
    feat_pack: Any = None


def tile_grid(width: int, height: int, tile: int = TILE):
    return (width + tile - 1) // tile, (height + tile - 1) // tile


def gaussian_rects(xy, radius, tiles_x: int, tiles_y: int, tile: int = TILE,
                   extent_x=None, extent_y=None):
    """Per-Gaussian tile rect [min, max) and touched-count (auxiliary.h:62-72,
    forward.cu:399-403). ``extent_x/y`` override the circular radius with
    per-axis ellipse extents (already min'd with radius by the caller)."""
    ex = radius if extent_x is None else extent_x
    ey = radius if extent_y is None else extent_y
    rx_min = jnp.clip(jnp.floor((xy[:, 0] - ex) / tile), 0, tiles_x).astype(jnp.int32)
    ry_min = jnp.clip(jnp.floor((xy[:, 1] - ey) / tile), 0, tiles_y).astype(jnp.int32)
    # exclusive max = tile of the last covered coordinate + 1. (NOT the
    # reference's (x + r + tile-1)/tile trick — that assumes integer radii
    # and under-covers by one tile when (x + extent) mod tile < 1.)
    rx_max = jnp.clip(jnp.floor((xy[:, 0] + ex) / tile) + 1, 0, tiles_x).astype(jnp.int32)
    ry_max = jnp.clip(jnp.floor((xy[:, 1] + ey) / tile) + 1, 0, tiles_y).astype(jnp.int32)
    w = jnp.maximum(rx_max - rx_min, 0)
    h = jnp.maximum(ry_max - ry_min, 0)
    return rx_min, ry_min, w, h, w * h


def _q_min_over_rect(cx, cy, a, b, c, x0, x1, y0, y1):
    """min over [x0,x1]x[y0,y1] of Q(d) = a dx^2 + 2 b dx dy + c dy^2 with
    d = p - (cx, cy). Convex (conic is PD after the Mip 2D filter), so the
    min is 0 if the center is inside, else on one of the 4 edges where the
    1D minimizer has a closed form."""
    dx0, dx1 = x0 - cx, x1 - cx
    dy0, dy1 = y0 - cy, y1 - cy
    a_s = jnp.maximum(a, 1e-12)
    c_s = jnp.maximum(c, 1e-12)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    def edge_x(dxe):  # dx fixed at an x-edge, minimize over dy
        dy = jnp.clip(-b * dxe / c_s, dy0, dy1)
        return q(dxe, dy)

    def edge_y(dye):
        dx = jnp.clip(-b * dye / a_s, dx0, dx1)
        return q(dx, dye)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(dx0), edge_x(dx1)),
        jnp.minimum(edge_y(dy0), edge_y(dy1)),
    )
    inside = (dx0 <= 0) & (dx1 >= 0) & (dy0 <= 0) & (dy1 >= 0)
    return jnp.where(inside, 0.0, qmin)


SORT_GROUP = int(_os.environ.get("RADEGS_SORT_GROUP", "6"))


def sort_grouped(operands, num_keys: int = 1, group: int | None = None):
    """Variadic stable sort in PAYLOAD GROUPS: ceil(P/g) independent stable
    sorts of (keys..., group_i), each reproducing the identical permutation
    (stability + identical keys), concatenated back in operand order.

    Why: XLA:TPU's many-operand sort lowers through a comparator whose
    remote compile hangs/expodes at high operand counts (round-4: a 26-
    payload stable sort froze the compile twice; 2-3 operand sorts are the
    measured fast path). Grouping keeps every individual sort narrow while
    the total data movement stays one sort's worth per column.
    $RADEGS_SORT_GROUP tunes the group size (device A/B), 0 = monolithic.
    """
    if group is None:
        group = SORT_GROUP
    keys = operands[:num_keys]
    pays = list(operands[num_keys:])
    if group <= 0 or len(pays) <= group:
        return jax.lax.sort(tuple(operands), num_keys=num_keys, is_stable=True)
    out_keys = None
    out_pays = []
    for i in range(0, len(pays), group):
        res = jax.lax.sort(tuple(keys) + tuple(pays[i:i + group]),
                           num_keys=num_keys, is_stable=True)
        if out_keys is None:
            out_keys = res[:num_keys]
        out_pays.extend(res[num_keys:])
    return tuple(out_keys) + tuple(out_pays)


def _owner_merge(starts, B: int):
    """slot -> covering-run index via a MERGE of run starts into slot
    positions, built from two stable sorts + a cumsum — replacing the
    scatter-of-ones + cumsum trick whose scatter cost scales with the
    B-sized target table (~150-200 ms/Mrow at multi-M budgets) while
    lax.sort stays sub-ms at 16M rows (BENCH_NOTES round-4).

    ``starts``: (P,) int32, nondecreasing, B for runs owning no slots.
    Returns (B,) int32: index of the last run with start <= slot (-1 if
    none, i.e. no alive runs)."""
    P = starts.shape[0]
    # parity tags merge order: a run start sorts BEFORE the slot at the
    # same position (key 2s < 2s+1), so the cumsum counts it as covering
    key = jnp.concatenate(
        [starts * 2, jnp.arange(B, dtype=jnp.int32) * 2 + 1])
    tag = jnp.concatenate(
        [jnp.ones((P,), jnp.int32), jnp.zeros((B,), jnp.int32)])
    _, tag_s = jax.lax.sort((key, tag), num_keys=1, is_stable=True)
    own = jnp.cumsum(tag_s) - 1  # runs started at or before each merged row
    # compact the slot rows back out: stable sort by tag puts the B slot
    # rows first, preserving their (already slot-index) relative order
    _, own_slots = jax.lax.sort((tag_s, own), num_keys=1, is_stable=True)
    return own_slots[:B]


def bin_gaussians(
    xy,
    radius,
    depth,
    valid,
    width: int,
    height: int,
    instance_budget: int,
    max_per_tile: int,
    tile: int = TILE,
    conic=None,
    opacity=None,
    need_tile_gauss: bool = True,
    seg_rows: int = 1 << 21,
    need_sorted_orig: bool = False,
    features=None,
) -> TileBinning:
    """Build the tile work lists. All shapes static; jit/vmap/shard-friendly.

    Args:
      xy, radius, depth, valid: (P,) preprocess outputs.
      instance_budget: B — static cap on total (gaussian, tile) pairs.
      max_per_tile: K — static cap on Gaussians per tile.
      conic, opacity: optional (P,3)/(P,) — enable the opacity-aware ellipse
        AABB and the exact per-tile cull (see module docstring). Exact:
        culled (gaussian, tile) pairs contribute alpha < 1/255 everywhere in
        the tile, which the blend kernels skip anyway.
      need_tile_gauss: build the rectangular (T, K) layout (XLA-scan path);
        the Pallas path reads the flat layout only.
      features: optional (P, 24) per-gaussian blend-feature rows (the
        pallas_blend.FEAT_LAYOUT column order). When given (requires
        conic+opacity), the features ride the slot expansion (one monotone
        gather) and the tile sort (payload columns are ~free —
        1-key+26-payload lax.sort measured 0.54 ms at 8M rows) and the
        result carries ``feat_pack``, the ready (32, Bs) kernel input —
        eliminating the post-sort random-id feature gather that cost
        ~320 ms at dense scale (BENCH_NOTES round-4).
    """
    P = xy.shape[0]
    tiles_x, tiles_y = tile_grid(width, height, tile)
    num_tiles = tiles_x * tiles_y
    B = instance_budget
    # the packed f32 gather below carries int columns (offsets up to B)
    # exactly only through 2^24 — a bigger budget would silently corrupt
    # tile decoding (f32 has 24 mantissa bits)
    if B > (1 << 24):
        raise ValueError(
            f"instance_budget={B} exceeds 2^24; the packed f32 slot gather "
            "cannot carry offsets exactly past that"
        )

    precise = conic is not None and opacity is not None
    if features is not None and not precise:
        raise ValueError("features riding requires conic+opacity (the cull "
                         "reads xy/conic straight from the feature columns)")
    if precise:
        op = opacity[:, 0] if opacity.ndim == 2 else opacity
        tau = 2.0 * jnp.log(jnp.maximum(op, 1e-12) / ALPHA_EPS)
        tau = jnp.maximum(tau, 0.0)  # op <= 1/255 -> empty level set
        a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
        det = jnp.maximum(a * c - b * b, 1e-24)
        # cov = conic^-1: cov00 = c/det, cov11 = a/det
        ex = jnp.minimum(jnp.sqrt(tau * c / det), radius)
        ey = jnp.minimum(jnp.sqrt(tau * a / det), radius)
        rx_min, ry_min, w, h, touched = gaussian_rects(
            xy, radius, tiles_x, tiles_y, tile, extent_x=ex, extent_y=ey
        )
    else:
        rx_min, ry_min, w, h, touched = gaussian_rects(xy, radius, tiles_x, tiles_y, tile)
    alive = valid & (radius > 0) & (touched > 0)
    touched = jnp.where(alive, touched, 0)

    # Lay expansion runs out in DEPTH order (near -> far; dead gaussians get
    # key inf so they sort last and own no slots): for any tile, the
    # subsequence of slots hitting it is then already depth-ordered, so the
    # (tile, depth) sort below needs only the tile key + stability.
    depth_key = jnp.where(alive, depth, jnp.inf)
    perm = jnp.argsort(depth_key)  # (P,) gaussian ids, near -> far
    touched_p = touched[perm]
    alive_p = alive[perm]

    # exclusive prefix sum -> slot offsets (cub InclusiveSum, rasterizer_impl.cu:350)
    offsets_p = jnp.cumsum(touched_p) - touched_p
    total = offsets_p[-1] + touched_p[-1]
    n_overflow = jnp.maximum(total - B, 0)

    # --- expand runs: slot -> owning gaussian ---
    # Every gaussian owns a run — DEAD ones own a ZERO-LENGTH run (touched
    # 0 => start == the next run's start, so at tied starts the last run,
    # which is always the next alive one, wins the owner count and dead
    # runs can never own a slot). This removes the old alive-compaction
    # (nonzero + perm[alive_pos]) and, more importantly, lets the packed
    # table be built as ONE (P, k) row gather by ``perm`` instead of ~13
    # separate P-sized scalar gathers (each a ~20 ms/2M-element slow path
    # on TPU — the dominant term of the measured dense binning bar).
    starts = jnp.where(offsets_p < B, offsets_p, B).astype(jnp.int32)
    if _os.environ.get("RADEGS_BIN_OWNER", "merge") == "merge":
        owner = _owner_merge(starts, B)
    else:
        # legacy scatter + cumsum (kept for device A/B: the scatter's cost
        # scales with the B-sized target table)
        ones = jnp.zeros((B + 1,), jnp.int32).at[starts].add(1)
        owner = jnp.cumsum(ones[:-1]) - 1  # runs started at or before slot

    # packed run table: elementwise stack in ORIGINAL gaussian order, then
    # one row gather by perm. Int columns are <= 2^24 (the exact-integer
    # limit of f32, asserted against instance_budget above). With
    # ``features`` the same gather also carries the 24 blend-feature
    # columns (cull reads xy/conic from them; only tau is dedicated).
    wf = jnp.maximum(w, 1).astype(jnp.float32)
    if features is not None:
        orig = jnp.concatenate(
            [jnp.stack([wf, rx_min.astype(jnp.float32),
                        ry_min.astype(jnp.float32), tau], axis=1),
             features], axis=1)  # (P, 4 + 24)
        CULL = dict(cx=6, cy=7, a=8, b=9, c=10, tau=5)
        n_feat = features.shape[1]
    elif precise:
        orig = jnp.stack([wf, rx_min.astype(jnp.float32),
                          ry_min.astype(jnp.float32),
                          xy[:, 0], xy[:, 1], a, b, c, tau], axis=1)
        CULL = dict(cx=5, cy=6, a=7, b=8, c=9, tau=10)
        n_feat = 0
    else:
        orig = jnp.stack([wf, rx_min.astype(jnp.float32),
                          ry_min.astype(jnp.float32)], axis=1)
        n_feat = 0
    g_perm = orig[perm]  # the ONE (P, k) row gather
    packed = jnp.concatenate(
        [perm.astype(jnp.float32)[:, None],
         offsets_p.astype(jnp.float32)[:, None], g_perm], axis=1)

    # --- segmented expansion: the per-slot gather + decode + exact cull run
    # per 2M-slot block under lax.cond, so blocks entirely past ``total``
    # cost nothing. The budget bounds the PEAK instance count over views, so
    # much of B is usually padding; the monolithic version paid the (B,12)
    # gather and the cull math on every padding slot (measured 1.05 s of a
    # 3.6 s dense step at B=16M with 4.7M real instances, BENCH_NOTES.md).
    total_capped = jnp.minimum(total, B)

    def expand_seg(s0, s1):
        n = s1 - s0

        def live(_):
            sl_idx = jnp.arange(s0, s1, dtype=jnp.int32)
            sp = packed[jnp.clip(owner[s0:s1], 0, P - 1)]  # (n, 5|11|30)
            sl = sp[:, :5].astype(jnp.int32)
            svalid = sl_idx < total_capped
            g = jnp.where(svalid, sl[:, 0], -1)
            # slot offset within the gaussian's rect -> tile coordinates.
            # integer div/mod with a variable divisor has no TPU hardware
            # path (~20ms/step at B=2^20); exact float division instead:
            # the +0.5 keeps (within+0.5)/w strictly inside (q, q+1) for
            # w <= 2^15, within < 2^23
            within = sl_idx - sl[:, 1]
            qd = jnp.floor((within.astype(jnp.float32) + 0.5) / sp[:, 2])
            qd = qd.astype(jnp.int32)
            ty = sl[:, 4] + qd
            tx = sl[:, 3] + within - qd * sl[:, 2]
            t = jnp.where(svalid, ty * tiles_x + tx, num_tiles)
            nc = jnp.zeros((), jnp.int32)
            if precise:
                # exact per-tile cull
                x0 = (tx * tile).astype(jnp.float32)
                y0 = (ty * tile).astype(jnp.float32)
                qmin = _q_min_over_rect(
                    sp[:, CULL["cx"]], sp[:, CULL["cy"]], sp[:, CULL["a"]],
                    sp[:, CULL["b"]], sp[:, CULL["c"]],
                    x0, x0 + (tile - 1), y0, y0 + (tile - 1),
                )
                # tiny slack so borderline alpha ~ 1/255 contributors never
                # flip between binning (f32) and the blend's threshold test
                keep = qmin <= sp[:, CULL["tau"]] * (1.0 + 1e-5) + 1e-6
                nc = jnp.sum((svalid & ~keep).astype(jnp.int32))
                t = jnp.where(keep, t, num_tiles)
            if n_feat:
                # padding slots (clipped owner) must not leak a real
                # gaussian's features; culled slots keep theirs (they sort
                # past every tile range and are never read)
                f = jnp.where(svalid[:, None], sp[:, 6:], 0.0)
            else:
                f = jnp.zeros((n, 0), jnp.float32)
            return t, g, f, nc

        def dead(_):
            return (jnp.full((n,), num_tiles, jnp.int32),
                    jnp.full((n,), -1, jnp.int32),
                    jnp.zeros((n, n_feat), jnp.float32),
                    jnp.zeros((), jnp.int32))

        if s0 == 0:
            return live(0)  # always at least one live segment
        return jax.lax.cond(s0 < total_capped, live, dead, 0)

    parts = [expand_seg(s0, min(s0 + seg_rows, B))
             for s0 in range(0, B, seg_rows)]
    if len(parts) == 1:
        tid, gid, feat, n_culled = parts[0]
    else:
        tid = jnp.concatenate([p[0] for p in parts])
        gid = jnp.concatenate([p[1] for p in parts])
        feat = jnp.concatenate([p[2] for p in parts])
        n_culled = sum(p[3] for p in parts)

    # --- stable sort by tile with one SENTINEL entry per tile ---
    # (radix sort, rasterizer_impl.cu:376-381). Slots are generated in depth
    # order, so a STABLE single-key sort by tile id alone yields (tile,
    # depth) order. Sentinels are appended AFTER all real slots, so
    # stability also puts each sentinel after its tile's real instances and
    # per-tile ranges fall out of the sorted order itself.
    # Culled + padding slots carry tid=num_tiles and sort to the very end.
    # The blend-feature columns (if any) ride the same sort as payloads —
    # payload columns are nearly free (BENCH_NOTES round-4).
    T_sent = num_tiles
    tid_all = jnp.concatenate([tid, jnp.arange(T_sent, dtype=jnp.int32)])
    gid_all = jnp.concatenate([gid, jnp.full((T_sent,), -1, jnp.int32)])
    operands = [tid_all, gid_all]
    operands += [jnp.concatenate([feat[:, k], jnp.zeros((T_sent,), jnp.float32)])
                 for k in range(n_feat)]
    if need_sorted_orig:
        # diagnostics-only permutation column (no hot-path consumers)
        operands.append(jnp.concatenate(
            [jnp.arange(B, dtype=jnp.int32), jnp.full((T_sent,), -1, jnp.int32)]
        ))
    out_s = sort_grouped(tuple(operands), num_keys=1)
    tid_s, gid_s = out_s[0], out_s[1]
    orig_s = out_s[-1] if need_sorted_orig else None
    Bs = B + T_sent
    if n_feat:
        # ready-to-DMA kernel pack: 24 feature rows + gid (row 24) + pad —
        # the layout contract of pallas_blend.sorted_features
        feat_pack = jnp.concatenate([
            jnp.stack(out_s[2:2 + n_feat], axis=0),
            gid_s.astype(jnp.float32)[None],
            jnp.zeros((32 - n_feat - 1, Bs), jnp.float32)], axis=0)
    else:
        feat_pack = None

    # sentinel t sits at position s_pos[t]; real rows of tile t occupy
    # (s_pos[t-1], s_pos[t]) exclusive of both sentinels. Sentinels are
    # exactly the rows with gid < 0 AND a real tile id: real slots always
    # carry gid >= 0 (culled slots keep their gid but move to tid=num_tiles;
    # padding slots have gid=-1 but also tid=num_tiles). Their positions
    # come from a COMPACTION SORT (sentinels surface in tile order because
    # the main sort left them tile-ordered and this sort is stable) — the
    # scatter it replaces aimed every non-sentinel row at one dump slot,
    # the catastrophic-serialization pattern (~2.3 s at 16M rows, CLAUDE.md).
    flag = (gid_s < 0) & (tid_s < num_tiles)
    _, pos_s = jax.lax.sort(
        (jnp.where(flag, 0, 1).astype(jnp.int32),
         jnp.arange(Bs, dtype=jnp.int32)),
        num_keys=1, is_stable=True)
    s_pos = pos_s[:T_sent]
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_pos[:-1]])
    tile_start = prev + 1
    tile_count_full = s_pos - prev - 1
    tile_count = jnp.minimum(tile_count_full, max_per_tile)
    tile_overflow = jnp.sum(tile_count_full - tile_count)
    max_tile_count = jnp.max(tile_count_full)

    if need_tile_gauss:
        # --- rectangular [T, K] gather --- one lax.gather of contiguous
        # K-slices (a vmapped dynamic_slice lowers to a while loop; an
        # element-wise 2D gather takes the ~7ns/element slow path)
        K = max_per_tile
        gid_pad = jnp.concatenate([gid_s, jnp.full((K,), -1, jnp.int32)])
        seg = jax.lax.gather(
            gid_pad,
            tile_start[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
            ),
            slice_sizes=(K,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (T, K)
        cols = jnp.arange(K, dtype=jnp.int32)
        tile_gauss = jnp.where(cols[None, :] < tile_count[:, None], seg, -1)
    else:
        tile_gauss = None

    return TileBinning(
        gauss_id=gid_s,
        tile_id=tid_s,
        tile_start=tile_start,
        tile_count=tile_count,
        tile_gauss=tile_gauss,
        n_instances=total,
        n_overflow=n_overflow,
        tile_overflow=tile_overflow,
        max_tile_count=max_tile_count,
        sorted_orig=orig_s,
        expand_offsets=jnp.minimum(jnp.where(alive_p, offsets_p, B), B).astype(jnp.int32),
        n_culled=n_culled,
        feat_pack=feat_pack,
    )


def default_instance_budget(num_points: int, multiplier: int = 8, minimum: int = 1 << 14) -> int:
    """Heuristic static budget: ~multiplier tiles per Gaussian, padded to a
    power of two so recompiles are rare as P grows."""
    b = max(minimum, num_points * multiplier)
    return 1 << (b - 1).bit_length()


BUDGET_SEG = 1 << 21  # segment granularity of the budget-priced stages
MAX_INSTANCE_BUDGET = 1 << 24  # f32-exact slot bound + HBM guard


def round_budget(need: int, minimum: int = 1 << 14) -> int:
    """Round a measured instance demand up to a compile bucket: powers of
    two below one segment (small scenes — halving granularity is fine
    there), 2M-segment multiples above (every budget-priced stage runs per
    2M-row segment under lax.cond, so a 10.5M budget really costs ~10.5M,
    not 16M — the power-of-2 rule wasted up to 2x on sort+pack+reduction
    at dense-scene scale, BENCH_NOTES.md)."""
    need = max(int(need), minimum)
    if need <= BUDGET_SEG:
        return 1 << (need - 1).bit_length()
    segs = -(-need // BUDGET_SEG)
    return min(segs * BUDGET_SEG, MAX_INSTANCE_BUDGET)

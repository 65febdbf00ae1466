"""Sort-based MXU segment-sum: per-Gaussian gradient reduction without
scatters.

Replaces the deterministic row scatter-add of ``pallas_blend._reduce_grad_rows``
(the TPU stand-in for the reference's ``atomicAdd`` accumulation in
backward.cu:631-1016) for large instance counts, where scatter cost scales
with the TARGET table size (~150-200 ms/Mrow into multi-M-row tables,
CLAUDE.md cost table; the dense-scene breakdown measured the reduction at
~700 ms of a 1.85 s step).

Design (TPU-first, no scatter anywhere):

1. ``lax.sort`` the per-instance gradient rows by gaussian id — one
   variadic single-key sort (sorts are the cheap data-movement primitive
   on TPU; a scatter is not).
2. After the sort each gaussian's rows are CONTIGUOUS.  A Pallas kernel
   walks windows of ``win`` consecutive gaussian ids; for each chunk of
   ``chunk`` sorted rows it builds the one-hot membership matrix
   S[j, i] = (gid[i] == win0 + j) in VMEM and reduces with ONE MXU matmul
   ``rows (32, C) @ S^T (win, C) -> (32, win)``.  The one-hot is exact in
   any precision, alignment/garbage lanes fall out of the window and
   contribute zero, and accumulation order is deterministic (lane order
   within a chunk, chunk order within a window, segment order across
   segments) — no atomics, no read-modify-write.

Out-of-window rows cost nothing: window w's row range [row_start[w],
row_start[w+1]) comes from a binary search over the sorted keys, so the
kernel's work is proportional to the REAL row count plus one chunk per
non-empty window.

``seg_rows``: XLA has no merge primitive, so ONE sort prices at the full
static budget B_out even when most lanes are dead padding.  With
``seg_rows`` set, each 2M-lane segment is sorted INDEPENDENTLY under
``lax.cond`` (live rows are a prefix of the kernel's compaction-ring
output, so trailing segments skip the sort entirely) and the kernel walks
each window's row range in every segment — a merge-free segmented sort
whose cost is proportional to the live rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radegs_tpu.ops.pallas_blend import N_GRAD, N_GRAD_PAD


def _searchsorted_left(keys, queries):
    """First index where keys[i] >= q, for sorted i32 ``keys`` (B,) and i32
    ``queries`` (Q,).  Unrolled binary search (jnp.searchsorted's default
    'scan' method is sequential on TPU)."""
    B = keys.shape[0]
    lo = jnp.zeros_like(queries)
    hi = jnp.full_like(queries, B)
    for _ in range(max(1, B.bit_length())):
        # fixed unroll: once lo == hi the lane is DONE and must freeze —
        # an unguarded step re-tests mid == lo and pushes lo past B when
        # the query exceeds every key (off-by-one that made the caller
        # walk one chunk into the NEXT segment's rows)
        active = lo < hi
        mid = (lo + hi) >> 1
        km = keys[jnp.clip(mid, 0, B - 1)]
        go_right = active & (km < queries)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo


@functools.partial(jax.jit, static_argnames=("P", "max_run", "seg_rows"))
def reduce_grad_rows_scan(grad_inst, total, P: int, *, max_run: int | None = None,
                          seg_rows: int = 1 << 21):
    """Instance -> gaussian gradient reduction via sort + segmented
    shift-add scan — pure XLA, deterministic, scatter-free, Mosaic-free.

    Same contract as ``pallas_blend._reduce_grad_rows`` / the MXU path:
    (N_GRAD_PAD, B_out) with gid as f32 in row N_GRAD -> (N_GRAD, P);
    rows past ``total`` or with gid outside [0, P) are ignored.

    Motivation (BENCH_NOTES round-4): the scatter path's cost scales with
    the P-sized target table (~150-200 ms/Mrow at multi-M targets) and the
    Pallas MXU path hangs the remote TPU compile; lax.sort meanwhile is
    sub-ms at 16M rows with 26 payload columns.  So: (1) ONE sort brings
    every gaussian's rows together, (2) a Hillis-Steele segmented inclusive
    scan (log2(max_run) shift-compare-add passes — runs are bounded by the
    tile count, not B) leaves each run's TOTAL at its last row, (3) a
    compaction sort moves run-end rows to the front, and (4) the
    binning-style merge trick maps each gaussian id to its run row with two
    more (B_out+P)-row sorts and one near-monotone P-row gather.  Summation
    order within a run is a fixed binary tree — bit-deterministic across
    runs and devices.

    ``max_run``: upper bound on any single gaussian's instance count
    (callers pass the tile count: a gaussian contributes at most one
    instance per tile).  None = B_out (safe, more scan passes).
    """
    B_out = grad_inst.shape[1]
    q = jnp.arange(B_out, dtype=jnp.int32)
    gq = grad_inst[N_GRAD].astype(jnp.int32)
    live = (q < total) & (gq >= 0) & (gq < P)
    # dead lanes can carry NaN/Inf garbage: zero values, dump key to P
    from radegs_tpu.ops.binning import sort_grouped

    key = jnp.where(live, gq, P)
    # grouped stable sorts: a monolithic 26-operand sort hangs the remote
    # TPU compile (see binning.sort_grouped). Stability also makes the
    # in-run summation order reproducible.
    ops = sort_grouped(
        (key,) + tuple(jnp.where(live, grad_inst[i], 0.0)
                       for i in range(N_GRAD)),
        num_keys=1)
    key_s = ops[0]
    vals = jnp.stack(ops[1:], axis=0)  # (N_GRAD, B_out)

    # segmented inclusive forward scan: after passes d = 1, 2, ..., every
    # position holds its run's sum over the trailing 2^(k+1) window, so the
    # run END holds the full total once 2^(k+1) >= run length.  The dump
    # run (key == P) may be longer — never read.
    bound = min(B_out, max_run) if max_run else B_out

    def scan_block(kb, ab):
        d = 1
        while d < bound:
            ksh = jnp.concatenate([jnp.full((d,), -1, kb.dtype), kb[:-d]])
            ash = jnp.pad(ab[:, :-d], ((0, 0), (d, 0)))
            ab = ab + jnp.where((ksh == kb)[None], ash, 0.0)
            d *= 2
        return ab

    if B_out <= seg_rows or (max_run or B_out) >= seg_rows:
        acc = scan_block(key_s, vals)
    else:
        # per-2M-segment scans under lax.cond (dump rows sort to the end,
        # so trailing all-dead segments skip the passes entirely) + an
        # EXACT cross-boundary fixup: a run is at most max_run << seg_rows
        # long, so it crosses at most ONE boundary, and its rows in the
        # next segment just add the run's completed prefix at the previous
        # segment's last row.  Fixups are independent across boundaries.
        n_seg = -(-B_out // seg_rows)
        pad = n_seg * seg_rows - B_out
        kp = jnp.pad(key_s, (0, pad), constant_values=P)
        vp = jnp.pad(vals, ((0, 0), (0, pad)))
        blocks = []
        for s in range(n_seg):
            s0 = s * seg_rows
            kb = kp[s0:s0 + seg_rows]
            vb = vp[:, s0:s0 + seg_rows]
            if s == 0:
                blocks.append(scan_block(kb, vb))
            else:
                blocks.append(jax.lax.cond(
                    jnp.asarray(s0, jnp.int32) < total,
                    lambda a, k=kb: scan_block(k, a), lambda a: a, vb))
        for s in range(1, n_seg):
            k_b = kp[s * seg_rows - 1]
            v_b = blocks[s - 1][:, -1]
            mask = kp[s * seg_rows:(s + 1) * seg_rows] == k_b
            blocks[s] = blocks[s] + jnp.where(mask[None], v_b[:, None], 0.0)
        acc = jnp.concatenate(blocks, axis=1)[:, :B_out]
    del vals

    nxt = jnp.concatenate([key_s[1:], jnp.full((1,), -1, key_s.dtype)])
    is_end = (key_s != nxt) & (key_s < P)
    ckey = jnp.where(is_end, key_s, P)
    comp = sort_grouped((ckey,) + tuple(acc[i] for i in range(N_GRAD)),
                        num_keys=1)
    K = min(B_out, P)  # <= one run-end row per gaussian
    table = jnp.stack(
        [comp[0][:K].astype(jnp.float32)]
        + [comp[i + 1][:K] for i in range(N_GRAD)], axis=1)  # (K, 1+N_GRAD)

    # gaussian id -> its (unique) run row: last compacted row with
    # gid <= p, via the merge trick of binning._owner_merge (run-end gids
    # are sorted unique below P; dump rows carry key 2P and never count)
    mk = jnp.concatenate(
        [comp[0][:K] * 2, jnp.arange(P, dtype=jnp.int32) * 2 + 1])
    mt = jnp.concatenate(
        [jnp.ones((K,), jnp.int32), jnp.zeros((P,), jnp.int32)])
    _, mt_s = jax.lax.sort((mk, mt), num_keys=1, is_stable=True)
    own = jnp.cumsum(mt_s) - 1
    _, own_q = jax.lax.sort((mt_s, own), num_keys=1, is_stable=True)
    j = jnp.clip(own_q[:P], 0, K - 1)
    rows = table[j]  # (P, 1+N_GRAD) near-monotone row gather
    present = rows[:, 0].astype(jnp.int32) == jnp.arange(P, dtype=jnp.int32)
    return jnp.where(present[None], rows[:, 1:].T, 0.0)


def _segsum_kernel(rs_ref, rows_hbm, out_ref, fbuf, sems, *, chunk: int,
                   win: int, n_win: int, n_seg: int, seg_rows: int):
    w = pl.program_id(0)
    C = chunk
    base = (w * win) * 1.0  # gids < 2^24: exact in f32
    # int iota then convert: Mosaic's tpu.iota is integer-only (an f32
    # broadcasted_iota fails MLIR verification at lowering time)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (win, C), 0).astype(jnp.float32)
    acc = jnp.zeros((N_GRAD_PAD, win), jnp.float32)

    for s in range(n_seg):  # static unroll; empty ranges cost nothing
        r0 = rs_ref[s * (n_win + 1) + w]  # segment-local row range
        r1 = rs_ref[s * (n_win + 1) + w + 1]
        r0a = (r0 // C) * C  # chunk-aligned start (head lanes mask to 0)
        nch = jnp.where(r1 > r0a, pl.cdiv(r1 - r0a, C), 0)
        seg_base = s * seg_rows  # multiple of C (asserted host-side)

        def dma(slot, k):
            off = pl.multiple_of(seg_base + r0a + k * C, C)
            return pltpu.make_async_copy(
                rows_hbm.at[:, pl.ds(off, C)], fbuf.at[slot], sems.at[slot]
            )

        @pl.when(nch > 0)
        def _():
            dma(0, 0).start()

        def body(k, acc):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < nch)
            def _():
                dma(1 - slot, k + 1).start()

            dma(slot, k).wait()
            blk = fbuf[slot]  # (32, C): rows 0..24 grads, row 25 sorted gid
            gid = blk[N_GRAD:N_GRAD + 1, :]  # (1, C)
            # one-hot membership: S[j, i] = (gid[i] == base + j); rows
            # outside [base, base+win) — chunk-head alignment lanes, the
            # next window's rows, dead/pad lanes (gid = n_win*win) — match
            # nothing
            sm = jnp.where(jrow == gid - base, 1.0, 0.0)  # (win, C)
            # contract the C lanes of both operands (an "NT" matmul, like
            # flash-attention's q @ k^T).  One-hot operand is exact in bf16
            # but the gradient rows are not: HIGHEST keeps f32 operand
            # precision.
            part = jax.lax.dot_general(
                blk, sm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (32, win)
            return acc + part

        acc = jax.lax.fori_loop(0, nch, body, acc)

    out_ref[...] = acc


@functools.partial(jax.jit,
                   static_argnames=("P", "win", "chunk", "interpret",
                                    "seg_rows"))
def reduce_grad_rows_mxu(grad_inst, total, P: int, *, win: int = 512,
                         chunk: int = 1024, interpret: bool = False,
                         seg_rows: int | None = None):
    """Instance -> gaussian gradient reduction, (N_GRAD_PAD, B_out) -> (N_GRAD, P).

    Drop-in replacement for ``pallas_blend._reduce_grad_rows`` (same
    contract: gid in row N_GRAD as f32, rows past ``total`` or with gid
    outside [0, P) ignored), built on sort + MXU one-hot matmuls instead of
    a scatter-add.  ``seg_rows`` (multiple of ``chunk``) sorts per segment
    so dead budget lanes skip the sort (see module docstring).
    """
    B_out = grad_inst.shape[1]
    n_win = -(-P // win)
    dead = n_win * win  # first key value past every window
    assert dead + win <= (1 << 24), "gid keys must stay f32-exact"

    q = jnp.arange(B_out, dtype=jnp.int32)
    gq = grad_inst[N_GRAD].astype(jnp.int32)
    live = (q < total) & (gq >= 0) & (gq < P)
    key = jnp.where(live, gq, dead)
    # Dead lanes can carry NaN/Inf garbage (degenerate-instance gradients);
    # the one-hot matmul multiplies them by 0 and NaN*0 = NaN would poison
    # the whole chunk's accumulation — zero the VALUES too, not just the key
    # (the scatter path gets this for free by dumping dead rows into a
    # dropped row).
    ops = (key,) + tuple(jnp.where(live, grad_inst[i], 0.0)
                         for i in range(N_GRAD))

    if seg_rows is None:
        seg = -(-B_out // chunk) * chunk  # one segment, chunk-padded
    else:
        assert seg_rows % chunk == 0, (seg_rows, chunk)
        seg = seg_rows
    n_seg = -(-B_out // seg)
    Bp = n_seg * seg
    pad = Bp - B_out
    ops = tuple(
        jnp.pad(op, (0, pad), constant_values=(dead if i == 0 else 0))
        for i, op in enumerate(ops)
    )

    queries = jnp.arange(n_win + 1, dtype=jnp.int32) * win
    sorted_parts = []  # per segment: tuple of sorted operands
    starts = []  # per segment: (n_win+1,) local row ranges
    for s in range(n_seg):
        s0, s1 = s * seg, (s + 1) * seg
        from radegs_tpu.ops.binning import sort_grouped

        ops_s = tuple(op[s0:s1] for op in ops)
        # grouped stable sorts — the monolithic 26-operand sort is the
        # prime suspect for this path's remote-compile hang (round-4)
        if s == 0:
            ops_s = sort_grouped(ops_s, num_keys=1)
        else:
            # trailing segments past the compaction ring's live prefix are
            # all-dead (key == dead everywhere after masking): already
            # "sorted", skip the work
            ops_s = jax.lax.cond(
                s0 < total,
                lambda o: tuple(sort_grouped(o, num_keys=1)),
                lambda o: o,
                ops_s,
            )
        sorted_parts.append(ops_s)
        # all-dead segments: every key == dead >= every query -> empty
        # ranges [0, 0) fall out of the same searchsorted
        starts.append(_searchsorted_left(ops_s[0], queries).astype(jnp.int32))

    key_s = jnp.concatenate([p[0] for p in sorted_parts])
    zero = jnp.zeros((Bp,), jnp.float32)
    rows = jnp.stack(
        [jnp.concatenate([p[i + 1] for p in sorted_parts])
         for i in range(N_GRAD)]
        + [key_s.astype(jnp.float32)]
        + [zero] * (N_GRAD_PAD - N_GRAD - 1),
        axis=0,
    )  # (32, Bp)
    row_start = jnp.concatenate(starts)  # (n_seg * (n_win+1),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_win,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((N_GRAD_PAD, win), lambda w, rs: (0, w),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, N_GRAD_PAD, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, chunk=chunk, win=win, n_win=n_win,
                          n_seg=n_seg, seg_rows=seg),
        out_shape=jax.ShapeDtypeStruct((N_GRAD_PAD, n_win * win), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(row_start, rows)
    return out[:N_GRAD, :P]

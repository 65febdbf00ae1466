"""Bisect the Mosaic compile crash: tiny kernels adding one suspect feature
at a time."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 128
B = 1024
T = 4


def run(name, kernel):
    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 8, 256), lambda t, s, c: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 25, CH), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        start = jnp.asarray([0, 100, 300, 700], jnp.int32)
        count = jnp.asarray([100, 200, 300, 200], jnp.int32)
        feat = jnp.asarray(np.random.default_rng(0).normal(size=(25, B)), jnp.float32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, 8, 256), jnp.float32),
            grid_spec=grid_spec,
        )(start, count, feat)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def k_aligned(start_ref, count_ref, feat_hbm, out_ref, fbuf, sems):
    t = pl.program_id(0)
    start = (start_ref[t] // CH) * CH * 0  # constant 0: plain aligned DMA
    dma = pltpu.make_async_copy(
        feat_hbm.at[:, pl.ds(pl.multiple_of(start, CH), CH)], fbuf.at[0], sems.at[0])
    dma.start()
    dma.wait()
    out_ref[0] = jnp.broadcast_to(jnp.sum(fbuf[0]), (8, 256))


def k_window(start_ref, count_ref, feat_hbm, out_ref, fbuf, sems):
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    start_al = (start // CH) * CH
    n_chunks = jnp.where(count > 0, pl.cdiv(start - start_al + count, CH), 0)

    def body(ci, acc):
        dma = pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(pl.multiple_of(start_al + ci * CH, CH), CH)],
            fbuf.at[0], sems.at[0])
        dma.start()
        dma.wait()
        return acc + jnp.sum(fbuf[0])

    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.float32(0))
    out_ref[0] = jnp.broadcast_to(acc, (8, 256))


def k_mm_highest(start_ref, count_ref, feat_hbm, out_ref, fbuf, sems):
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(feat_hbm.at[:, pl.ds(0, CH)], fbuf.at[0], sems.at[0])
    dma.start()
    dma.wait()
    f = fbuf[0]  # (25, CH)
    basis = jnp.concatenate([f[i : i + 1, :] for i in range(19)], axis=0)  # (19, CH)
    w = jnp.broadcast_to(f[0:1, :].T, (CH, 256))
    R = jax.lax.dot_general(
        basis, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = R[:8]


def k_tri_mm(start_ref, count_ref, feat_hbm, out_ref, fbuf, sems):
    t = pl.program_id(0)
    dma = pltpu.make_async_copy(feat_hbm.at[:, pl.ds(0, CH)], fbuf.at[0], sems.at[0])
    dma.start()
    dma.wait()
    r = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    tri = (r >= c).astype(jnp.float32)
    x = jnp.broadcast_to(fbuf[0][0:1, :].T, (CH, 256))
    R = jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = R[:8]


run("aligned-dma", k_aligned)
run("window-dma ", k_window)
run("mm-highest ", k_mm_highest)
run("tri-mm     ", k_tri_mm)

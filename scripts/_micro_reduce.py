"""Micro: what does the per-segment gradient reduction actually pay —
the (26, S).T transpose or the row scatter-add? Chained sums (CLAUDE.md
methodology) at the dense-step segment size.

    python scripts/_micro_reduce.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

NG = 26
S = 1 << 21  # segment rows
P = 1 << 21  # gaussians (dense-scene capacity)
ITERS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    bump = 0.0
    for _ in range(ITERS):
        out = fn(*[a + bump for a in args])
        bump = jnp.sum(out) * 1e-30
    float(bump)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {name:28s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(NG, S)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(S, NG)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, P, size=S), jnp.int32)

    @jax.jit
    def t_transpose(g):
        return jnp.sum(g.T, axis=1)  # forces the materialized transpose? no —
        # XLA fuses a sum-of-transpose into a sum. Use a scatter consumer.

    @jax.jit
    def t_scatter_pre(gt):
        return jnp.zeros((P + 1, NG), jnp.float32).at[gid].add(gt)[:P]

    @jax.jit
    def t_scatter_post(g):
        return jnp.zeros((P + 1, NG), jnp.float32).at[gid].add(g.T)[:P]

    @jax.jit
    def t_scatter_lane(g):
        # lane-oriented: scatter columns into (NG, P+1) by gid
        return jnp.zeros((NG, P + 1), jnp.float32).at[:, gid].add(g)[:, :P]

    @jax.jit
    def t_sortseg(g, gid):
        # sort-by-gid + boundary segment-sum alternative
        o = jnp.argsort(gid)
        gs = g.T[o]  # (S, NG) rows in gid order
        gids = gid[o]
        cs = jnp.cumsum(gs, axis=0)
        last = jnp.concatenate([gids[1:] != gids[:-1], jnp.ones((1,), bool)])
        idx = jnp.nonzero(last, size=S, fill_value=S - 1)[0]
        seg_end = cs[idx]
        seg_sum = jnp.diff(seg_end, axis=0, prepend=jnp.zeros((1, NG)))
        return jnp.zeros((P + 1, NG), jnp.float32).at[gids[idx]].set(seg_sum)[:P]

    print(f"S={S} rows, NG={NG}, P={P}")
    timed("scatter (pre-transposed)", t_scatter_pre, gt)
    timed("transpose + scatter", t_scatter_post, g)
    timed("lane scatter (no transpose)", t_scatter_lane, g)
    timed("sort+segsum", t_sortseg, g, gid)


if __name__ == "__main__":
    main()

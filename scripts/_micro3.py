"""Micro round 3: separate gather-vs-transpose costs at big-table sizes,
scalar histogram cost, and one-hot segment-matmul feasibility."""
import time

import jax
import jax.numpy as jnp
import numpy as np

T_TILES = 7500


def timed(fn, x, iters=10, warmup=2):
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def run(B):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(2 * B, 32)), jnp.float32)
    tableT = jnp.asarray(rng.normal(size=(32, 2 * B)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 2 * B, B), jnp.int32)
    tid = jnp.asarray(np.sort(rng.integers(0, T_TILES, B)), jnp.int32)
    perm = jnp.asarray(rng.permutation(B), jnp.int32)
    dest = jnp.asarray(rng.permutation(2 * B)[:B], jnp.int32)

    # NOTE closed-over device arrays get serialized into the remote compile
    # request (HTTP 413) — pass them as jit ARGUMENTS
    @jax.jit
    def row_gather_big(x, table, idx):
        out = table[idx] + x[:1] * 1e-20
        return x + jnp.sum(out) * 1e-20

    @jax.jit
    def transpose_big(x, tableT):
        out = (tableT + x[:1, :1]).T  # (2B,32)
        return x + jnp.sum(out) * 1e-20

    @jax.jit
    def hist_scalar(x, tid):
        h = jnp.zeros((T_TILES + 1,), jnp.int32).at[tid].add(1 + x * 0)
        return x + jnp.sum(h) * 0

    @jax.jit
    def scatter_int_unique(x, perm, dest):
        out = jnp.zeros((2 * B,), jnp.int32).at[perm].set(dest + x)
        return x + jnp.sum(out) * 0

    import functools

    print(f"B={B}:")
    print(f"  row_gather (2B,32) tbl, B idx : {timed(functools.partial(row_gather_big, table=table, idx=idx), table[:1])*1e3:7.2f} ms")
    print(f"  transpose (32,2B)->(2B,32)    : {timed(functools.partial(transpose_big, tableT=tableT), tableT[:1,:1])*1e3:7.2f} ms")
    print(f"  histogram (B,)->(T,) int add  : {timed(functools.partial(hist_scalar, tid=tid), jnp.int32(0))*1e3:7.2f} ms")
    print(f"  scatter_set uniq (B,) into 2B : {timed(functools.partial(scatter_int_unique, perm=perm, dest=dest), jnp.int32(0))*1e3:7.2f} ms", flush=True)


run(1 << 20)
run(1 << 21)

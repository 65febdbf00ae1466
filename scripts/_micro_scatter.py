"""Chained micro-benchmarks of candidate instance-pipeline primitives on
the TPU (CLAUDE.md: chain ops so results can't be cached/deduped; verify
linear scaling across sizes)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 1 << 17


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
    ids = jnp.asarray(rng.integers(0, P, B), jnp.int32)  # duplicate ids
    perm = jnp.asarray(rng.permutation(B), jnp.int32)  # unique ids
    rows25 = jnp.asarray(rng.normal(size=(B, 25)), jnp.float32)
    table24 = jnp.asarray(rng.normal(size=(P, 24)), jnp.float32)
    big24B = jnp.asarray(rng.normal(size=(B, 24)), jnp.float32)
    keys = jnp.asarray(rng.integers(0, 7500, B), jnp.int32)
    rank = jnp.asarray(rng.integers(0, P, B), jnp.int32)

    @jax.jit
    def scatter_add_dup(x):
        acc = jnp.zeros((P + 1, 25), jnp.float32).at[ids].add(x)
        return x + acc[:1] * 1e-20

    @jax.jit
    def scatter_add_dup_bf16(x):
        acc = jnp.zeros((P + 1, 25), jnp.bfloat16).at[ids].add(x.astype(jnp.bfloat16))
        return x + acc[:1].astype(jnp.float32) * 1e-20

    @jax.jit
    def row_gather_24(x):
        out = table24[jnp.clip(ids, 0, P - 1)] + x[:1] * 1e-20  # (B,24)
        return x + out[:1] * 1e-20

    @jax.jit
    def row_gather_24_bf16(x):
        t = table24.astype(jnp.bfloat16)
        out = t[jnp.clip(ids, 0, P - 1)]
        return x + out[:1].astype(jnp.float32) * 1e-20

    @jax.jit
    def transpose_24(x):
        out = (x + 0.0).T  # (24, B)
        return x + out[:, :1].T * 1e-20

    @jax.jit
    def sort_2key_2pay(x):
        a, b, c, dd = jax.lax.sort((keys + x, rank, perm, ids), num_keys=2)
        return x + a[0] * 0

    @jax.jit
    def sort_2key_8pay(x):
        arrs = jax.lax.sort(
            (keys + x, rank) + tuple(big24B[:, i] for i in range(6)), num_keys=2
        )
        return x + arrs[0][0] * 0

    @jax.jit
    def scan_fill_forward(x):
        # segmented fill-forward via associative_scan on (B, 8) payload
        val = big24B[:, :8] + x[:1, :8] * 1e-20
        flag = (perm % 7 == 0).astype(jnp.float32)[:, None]

        def comb(a, b):
            af, av = a
            bf, bv = b
            return jnp.maximum(af, bf), jnp.where(bf > 0, bv, av)

        f, v = jax.lax.associative_scan(comb, (jnp.broadcast_to(flag, val.shape), val), axis=0)
        return x + v[:1] * 1e-20

    print(f"B={B}:")
    for name, fn, x0 in [
        ("scatter_add dup (B,25)->(P,25) f32", scatter_add_dup, rows25),
        ("scatter_add dup bf16            ", scatter_add_dup_bf16, rows25),
        ("row_gather (P,24)->(B,24) f32   ", row_gather_24, big24B),
        ("row_gather bf16                 ", row_gather_24_bf16, big24B),
        ("transpose (B,24)->(24,B)        ", transpose_24, big24B),
        ("sort 2key+2 int payloads        ", sort_2key_2pay, jnp.int32(0)),
        ("sort 2key+6 f32 payloads        ", sort_2key_8pay, jnp.int32(0)),
        ("assoc_scan fill-fwd (B,8)       ", scan_fill_forward, big24B),
    ]:
        print(f"  {name}: {timed(fn, x0)*1e3:8.2f} ms", flush=True)


run(1 << 19)
run(1 << 20)
run(1 << 21)

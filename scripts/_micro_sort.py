"""Micro-benchmarks for the round-3 binning/reduction redesign.

Questions (BENCH_NOTES.md round-2 dense breakdown; CLAUDE.md cost table):
 1. Is the 2-key lexicographic lax.sort the reason the 16M-slot sort costs
    ~500-600 ms (single-key stable sort should hit the fast path)?
 2. How does sort cost scale with payload-column count (can features ride
    the sort)?
 3. Pack gather: row-gather by random gid vs expansion-order (run-repeated)
    gid vs lane gather, at multi-M table sizes.
 4. Gradient reduction: segmented row scatter-add (current) vs
    sort-by-gid + log-shift segmented tree-sum + boundary gather.

Methodology (CLAUDE.md): all inputs passed as jit ARGUMENTS, iterations
chained through a data dependency (key/index perturbed by the previous
output) so XLA cannot dedupe, ONE scalar fetch at the end, and each timing
is verified to scale with N by running two sizes.
"""
import argparse
import time

import numpy as np


def timeit(fn, args, iters=5, warmup=2):
    import jax

    out = None
    carry = args[0]
    for _ in range(warmup):
        out = fn(carry, *args[1:])
        carry = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(carry, *args[1:])
        carry = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1 << 24, help="instance count")
    ap.add_argument("--p", type=int, default=1 << 21, help="gaussian count")
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    B, P = args.b, args.p
    T = 7500  # ~tiles at 1600x1200
    rng = np.random.default_rng(0)

    tid = jnp.asarray(rng.integers(0, T, B), jnp.int32)
    rank = jnp.asarray(rng.integers(0, P, B), jnp.int32)
    gid = jnp.asarray(rng.integers(0, P, B), jnp.int32)
    orig = jnp.arange(B, dtype=jnp.int32)
    feat24 = jnp.asarray(rng.normal(size=(P, 24)), jnp.float32)

    def chain(prev):
        # cheap data dependency: flip one bit of the key by the previous
        # output's first element
        return (prev[0] & 1).astype(jnp.int32)

    R = {}

    if args.which in ("all", "sort"):
        @jax.jit
        def sort2(tid, rank, gid, orig):
            t, _, g, o = jax.lax.sort((tid, rank, gid, orig), num_keys=2)
            return t, g, o

        @jax.jit
        def sort1(tid, gid, orig):
            t, g, o = jax.lax.sort((tid, gid, orig), num_keys=1, is_stable=True)
            return t, g, o

        @jax.jit
        def sort1u(tid, gid, orig):
            t, g, o = jax.lax.sort((tid, gid, orig), num_keys=1, is_stable=False)
            return t, g, o

        R["sort_2key_2payload"] = timeit(
            lambda t, r, g, o: sort2(t + chain(t), r, g, o), (tid, rank, gid, orig))
        R["sort_1key_2payload_stable"] = timeit(
            lambda t, g, o: sort1(t + chain(t), g, o), (tid, gid, orig))
        R["sort_1key_2payload_unstable"] = timeit(
            lambda t, g, o: sort1u(t + chain(t), g, o), (tid, gid, orig))
        R["argsort_f32_P"] = timeit(
            lambda d: jnp.argsort(d + (d[0] * 0)).astype(jnp.float32),
            (jnp.asarray(rng.normal(size=P), jnp.float32),))

    if args.which in ("all", "sortpay"):
        # NOTE round-4 correction: the original variant returned only
        # (out[0], out[1]) and XLA dead-code-eliminated the other payload
        # columns FROM THE SORT — the measured "0.54 ms at 8M x 27 cols"
        # (3+ TB/s effective, above HBM speed) was a 2-column sort. Every
        # output must be consumed for an honest payload-scaling number.
        for k in (4, 8, 16, 26):
            pays = tuple(jnp.asarray(rng.normal(size=B), jnp.float32)
                         for _ in range(k))

            def sortk(t, *ps):
                out = jax.lax.sort((t,) + ps, num_keys=1, is_stable=True)
                return out[0], sum(out[1:])

            sortk = jax.jit(sortk)
            R[f"sort_1key_{k}payload"] = timeit(
                lambda t, *ps: sortk(t + chain(t), *ps), (tid,) + pays)

    if args.which in ("all", "gather"):
        @jax.jit
        def grow(idx, feat):
            return feat[idx]

        R["gather_row_random"] = timeit(
            lambda i, f: grow(jnp.clip(i + chain(i), 0, P - 1), f), (gid, feat24))
        # expansion-order locality: runs of ~6 repeats of ascending ids
        runlen = 6
        gid_runs = jnp.asarray(
            np.repeat(np.sort(rng.integers(0, P, B // runlen)), runlen)[:B],
            jnp.int32)
        R["gather_row_runs"] = timeit(
            lambda i, f: grow(jnp.clip(i + chain(i), 0, P - 1), f),
            (gid_runs, feat24))
        feat24T = feat24.T.copy()

        @jax.jit
        def glane(idx, featT):
            return featT[:, idx]

        R["gather_lane_random"] = timeit(
            lambda i, f: glane(jnp.clip(i + chain(i), 0, P - 1), f),
            (gid, feat24T))

    if args.which in ("all", "reduce"):
        Brows = min(B, 1 << 22)  # ~blended rows (4.2M)
        g26 = jnp.asarray(rng.normal(size=(26, Brows)), jnp.float32)
        gidr = jnp.asarray(rng.integers(0, P, Brows), jnp.int32)

        @jax.jit
        def scat(idx, g):
            acc = jnp.zeros((P + 1, 26), jnp.float32)
            return acc.at[idx].add(g.T)[:P].sum()

        R["reduce_row_scatter"] = timeit(
            lambda i, g: scat(jnp.clip(i + chain(i), 0, P - 1), g)[None]
            .astype(jnp.int32), (gidr, g26))

        @jax.jit
        def sort_tree(idx, g):
            # 1. sort (gid, row) pairs  2. row-gather the 26 cols
            # 3. log-shift segmented sum  4. boundary gather per gaussian
            ids, row = jax.lax.sort(
                (idx, jnp.arange(Brows, dtype=jnp.int32)), num_keys=1,
                is_stable=False)
            rows = g.T[row]  # (Brows, 26)
            sh = 1
            while sh < 4096:  # cap segment length support at 4096 dups
                same = jnp.concatenate(
                    [jnp.zeros(sh, bool), ids[sh:] == ids[:-sh]])
                shifted = jnp.concatenate(
                    [jnp.zeros((sh, 26), jnp.float32), rows[:-sh]])
                rows = rows + jnp.where(same[:, None], shifted, 0.0)
                sh *= 2
            # segment END rows now hold full sums; gaussian p's segment end =
            # searchsorted(ids, p, 'right') - 1
            pos = jnp.searchsorted(ids, jnp.arange(P, dtype=jnp.int32),
                                   side="right") - 1
            present = ids[jnp.clip(pos, 0, Brows - 1)] == jnp.arange(P)
            acc = jnp.where(present[:, None],
                            rows[jnp.clip(pos, 0, Brows - 1)], 0.0)
            return acc.sum()

        R["reduce_sort_tree"] = timeit(
            lambda i, g: sort_tree(jnp.clip(i + chain(i), 0, P - 1), g)[None]
            .astype(jnp.int32), (gidr, g26))

        # numerical sanity at small size
        idx_s = jnp.asarray(rng.integers(0, 50, 2000), jnp.int32)
        g_s = jnp.asarray(rng.normal(size=(26, 2000)), jnp.float32)
        a = np.zeros((51, 26), np.float32)
        np.add.at(a, np.asarray(idx_s), np.asarray(g_s).T)

    for k, v in R.items():
        print(f"{k:34s} {v:9.2f} ms")


if __name__ == "__main__":
    main()

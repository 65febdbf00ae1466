"""Densification load rebalancing across shards (SURVEY.md §2.4:
"all-to-all for densification rebalancing").

The densification compaction (models/gaussian_model.py: masked argsort,
active-first) leaves active particles FRONT-PACKED in the canonical (C,)
layout. Under the particle-sharded mesh step that concentrates every active
particle in the low shards: per-shard COMPUTE is unaffected (static shapes —
each shard always processes its full block), but the visibility-compressed
gather caps each shard at ``vis_capacity`` rows, so a front-packed layout
forces V to be sized for the worst single shard (~all of it) instead of
n_vis / n — inflating gather bytes by up to the device count, or dropping
work when V is tight.

The fix is a STRIDED redistribution: canonical index ``i`` lives on shard
``i mod n`` at position ``i div n``.  Active particles then spread evenly by
construction (any canonical prefix does).  Expressed as a plain jitted
gather on GSPMD-sharded arrays, the regular stride pattern lowers to the
all-to-all-class collective the survey calls for — no custom transport.

Canonical order stays the SEMANTIC order: densify_step's per-slot PRNG
draws, the compaction argsort, and checkpoint/PLY layouts are all defined
on it, so the training loop unpermutes around each densification event
(train/loop.py) and returns canonical state — identical results to the
single-device loop, tested in tests/test_sharding.py.  Between
densifications (the hot steps) the state stays strided; every per-particle
op in the step (preprocess, compaction, Adam) is order-invariant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radegs_tpu.models import gaussian_model as gm


def strided_perm(capacity: int, n: int):
    """perm with strided[j] = canonical[perm[j]]: shard s slot k holds
    canonical index k * n + s (j = s * (C // n) + k)."""
    cn = capacity // n
    j = jnp.arange(capacity, dtype=jnp.int32)
    return (j % cn) * n + (j // cn)


def inverse_perm(perm):
    C = perm.shape[0]
    return jnp.zeros((C,), jnp.int32).at[perm].set(
        jnp.arange(C, dtype=jnp.int32))


def _permute_state(state: gm.GaussianState, perm):
    C = state.capacity

    def take(a):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == C:
            return jnp.take(a, perm, axis=0)
        return a

    return jax.tree.map(take, state)


@functools.partial(jax.jit, static_argnums=(1,))
def to_strided(state: gm.GaussianState, n: int):
    """Canonical -> strided layout (n must divide capacity; round_capacity
    keeps capacities powers of two, so any power-of-two mesh divides)."""
    assert state.capacity % n == 0, (state.capacity, n)
    return _permute_state(state, strided_perm(state.capacity, n))


@functools.partial(jax.jit, static_argnums=(1,))
def to_canonical(state: gm.GaussianState, n: int):
    """Strided -> canonical layout (inverse of to_strided)."""
    assert state.capacity % n == 0, (state.capacity, n)
    return _permute_state(state, inverse_perm(strided_perm(state.capacity, n)))

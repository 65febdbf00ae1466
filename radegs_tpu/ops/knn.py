"""K-nearest-neighbor mean squared distance (Gaussian scale initialization).

TPU-native replacement for simple-knn's ``distCUDA2`` (used once at
scene/gaussian_model.py:315 to set initial log-scales from point spacing).
The upstream CUDA code is an approximate Morton-sorted box search; here we
use the same idea as a pure-JAX windowed search over a Morton-ordered
sequence — static shapes, no atomics:

1. quantize positions to a 2^10 grid and interleave bits -> Morton codes,
2. argsort (one global sort),
3. for each point, examine a +-WINDOW slice of the sorted order and take the
   mean squared distance to its 3 nearest among those.

Approximation quality matches the reference's spirit (it is itself
approximate); an exact O(P^2) path is provided for small P / tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits(v):
    """Spread 10 bits over 30 (Morton interleave helper)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_codes(points):
    """(P,3) float -> (P,) int32 Morton codes on a 1024^3 grid over the bbox."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    span = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((points - lo) / span * 1023.0), 0, 1023).astype(jnp.uint32)
    return (
        _expand_bits(q[:, 0]) | (_expand_bits(q[:, 1]) << 1) | (_expand_bits(q[:, 2]) << 2)
    ).astype(jnp.int32)


def _window_knn_pass(points, k: int, window: int, perm):
    """k smallest squared distances per point from one Morton-ordered pass."""
    P = points.shape[0]
    code = morton_codes(points[:, perm])
    order = jnp.argsort(code)
    sorted_pts = points[order]

    W = window
    pad_lo = jnp.flip(sorted_pts[:W], axis=0) + 1e6  # far sentinels
    pad_hi = jnp.flip(sorted_pts[-W:], axis=0) + 1e6
    padded = jnp.concatenate([pad_lo, sorted_pts, pad_hi], axis=0)

    idx = jnp.arange(P)[:, None] + jnp.arange(2 * W + 1)[None, :]  # window incl self
    # component-wise distances: a (P, 2W+1, 3) gather would be lane-padded
    # 3 -> 128 on TPU (42x HBM blowup); (P, 2W+1) scalars are not
    d2 = sum(
        (padded[:, a][idx] - sorted_pts[:, a][:, None]) ** 2 for a in range(3)
    )
    d2 = d2.at[:, W].set(jnp.inf)  # drop self
    smallest = -jax.lax.top_k(-d2, k)[0]  # (P, k), sorted ascending? (desc of neg)
    # scatter back to original order
    out = jnp.zeros((P, k), points.dtype).at[order].set(smallest)
    return out


def _grid_knn_candidates(points, k: int, cap: int = 16, cell_mult: float = 1.0):
    """k smallest squared distances from a 27-cell spatial-hash search.

    Cells are sized to ~1 point each; per neighbor cell up to ``cap`` points
    (in hash order) are considered. Exact in uniform-density regions; sparse
    tails are covered by the Morton-window pass unioned in by the caller."""
    P = points.shape[0]
    lo = jnp.min(points, 0)
    hi = jnp.max(points, 0)
    vol = jnp.prod(jnp.maximum(hi - lo, 1e-9))
    cell = cell_mult * (vol / P) ** (1.0 / 3.0)
    res = jnp.minimum(jnp.maximum(((hi - lo) / cell).astype(jnp.int32) + 1, 1), 1024)
    cell_sz = jnp.maximum((hi - lo) / res.astype(jnp.float32), 1e-9)
    ijk = jnp.clip(((points - lo) / cell_sz).astype(jnp.int32), 0, res - 1)

    def cid(v):
        return (v[..., 2] * res[1] + v[..., 1]) * res[0] + v[..., 0]

    cids = cid(ijk)
    order = jnp.argsort(cids)
    sp = points[order]
    sc = cids[order]
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"),
        -1,
    ).reshape(27, 3)
    nijk = ijk[:, None, :] + offs[None, :, :]
    valid = jnp.all((nijk >= 0) & (nijk < res), -1)
    ncid = cid(jnp.clip(nijk, 0, res - 1))
    start = jnp.searchsorted(sc, ncid)
    end = jnp.searchsorted(sc, ncid, side="right")
    cnt = jnp.minimum(end - start, cap)
    idx = jnp.clip(
        start[:, :, None] + jnp.arange(cap)[None, None, :], 0, P - 1
    ).reshape(P, 27 * cap)
    ok = ((jnp.arange(cap)[None, None, :] < cnt[:, :, None]) & valid[:, :, None]).reshape(
        P, 27 * cap
    )
    # component-wise (see _window_knn_pass): avoid a (P, 27*cap, 3) gather
    d2 = sum((sp[:, a][idx] - points[:, a][:, None]) ** 2 for a in range(3))
    d2 = jnp.where(ok, d2, jnp.inf)
    d2 = jnp.where(d2 <= 1e-24, jnp.inf, d2)  # drop self
    return -jax.lax.top_k(-d2, k)[0]


def mean_dist2_knn(points, k: int = 3, window: int = 32):
    """Mean squared distance to the k nearest neighbors, per point.

    points: (P,3). Returns (P,). Matches distCUDA2 semantics (simple-knn):
    used as `scales = log(sqrt(clamp(dist2, 1e-7)))`.

    Strategy: union of (a) a 27-cell spatial-hash search (exact in dense
    regions, where a space-filling-curve window misses cross-boundary
    neighbors) and (b) a Morton-window pass (covers sparse tails where grid
    cells go empty), then k smallest after value-dedup. Always an
    over-approximation of the true mean (candidates are a neighbor subset),
    matching the upstream CUDA box search's bias direction.
    """
    P = points.shape[0]
    if P <= 2048:
        return _exact_mean_dist2(points, k)
    cands = [
        _grid_knn_candidates(points, k),
        _window_knn_pass(points, k, window, (0, 1, 2)),
    ]
    merged = jnp.sort(jnp.concatenate(cands, axis=1), axis=1)
    # dedup: the same neighbor found by both passes repeats with an
    # identical distance — mask repeats so it isn't counted twice
    dup = merged[:, 1:] == merged[:, :-1]
    merged = merged.at[:, 1:].set(jnp.where(dup, jnp.inf, merged[:, 1:]))
    smallest = -jax.lax.top_k(-merged, k)[0]
    return jnp.mean(smallest, axis=-1)


def _exact_mean_dist2(points, k: int = 3):
    # component-wise: (P, P) scalars, never a (P, P, 3) lane-padded tensor
    d2 = sum((points[:, a][:, None] - points[:, a][None, :]) ** 2 for a in range(3))
    d2 = jnp.where(jnp.eye(points.shape[0], dtype=bool), jnp.inf, d2)
    smallest = -jax.lax.top_k(-d2, k)[0]
    return jnp.mean(smallest, axis=-1)

"""Device mesh & sharding layer (SURVEY.md §2.4 / §5.8).

The reference is a single-GPU program (utils/general_utils.py:135); scaling
lives entirely inside its CUDA kernels.  The TPU build instead scales over a
`jax.sharding.Mesh` with two logical axes:

- ``g`` (gaussians): the capacity/parameter axis.  All (C, ...) arrays in
  GaussianState — parameters, Adam moments, densification accumulators — are
  sharded over ``g``.  Per-Gaussian preprocessing (projection, covariance,
  SH) is then embarrassingly parallel with zero communication.
- ``t`` (tiles): the image axis.  Per-tile blending work (the reference's
  one-block-per-tile grid, forward.cu:428) shards over ``t``.

Communication pattern under jit/GSPMD: preprocess runs gaussian-sharded;
binning's global depth-sort and the per-tile gather induce an all-gather of
the (visible) per-Gaussian attributes to the tile shards; the backward
scatter (segment-sum by gaussian id) induces a reduce-scatter of gradients
back to the ``g`` shards.  Both ride ICI — XLA inserts them from the
sharding constraints; there is no hand-written collective in the hot path.

Parameter updates (Adam) are local to each ``g`` shard — the analogue of a
fully-sharded optimizer: no gradient all-reduce is needed because each shard
owns its Gaussians outright (this is model parallelism over the particle
axis, not data parallelism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GAUSS_AXIS = "g"
TILE_AXIS = "t"


def make_mesh(devices=None, tile_parallel: int = 1) -> Mesh:
    """Build a (g, t) mesh. Default: all devices on the gaussian axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % tile_parallel == 0, (n, tile_parallel)
    arr = np.asarray(devices).reshape(n // tile_parallel, tile_parallel)
    return Mesh(arr, (GAUSS_AXIS, TILE_AXIS))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def gaussian_sharding(mesh: Mesh):
    """Sharding for a (C, ...) per-Gaussian array: dim 0 over the g axis."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def _shard_leaf(mesh: Mesh, capacity: int, x):
    x = jnp.asarray(x)
    if x.ndim >= 1 and x.shape[0] == capacity:
        return jax.device_put(x, gaussian_sharding(mesh))
    return jax.device_put(x, replicate(mesh))


def shard_gaussian_state(state, mesh: Mesh):
    """Place a GaussianState on the mesh: every (C, ...) leaf sharded over
    ``g``, scalars replicated. Capacity must divide the g-axis size."""
    C = state.capacity
    assert C % mesh.shape[GAUSS_AXIS] == 0, (C, dict(mesh.shape))
    return jax.tree.map(lambda x: _shard_leaf(mesh, C, x), state)


def shard_train_state(ts, mesh: Mesh):
    """Place a train.loop.TrainState on the mesh (appearance params and
    scalars replicated, gaussians sharded)."""
    g = shard_gaussian_state(ts.gaussians, mesh)
    rest = ts.replace(gaussians=None)
    rest = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), replicate(mesh)), rest)
    return rest.replace(gaussians=g)


def shard_camera(cam, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), replicate(mesh)), cam)

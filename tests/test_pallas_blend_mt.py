"""Multi-tile (occupancy-batched) blend kernels vs the single-tile kernels.

The single-tile Pallas kernels are pinned to the XLA scan / autodiff oracle
(test_pallas_blend.py), so BIT-EXACT parity here extends the validation
chain to the batched variants: same math per (tile, sub-block), same global
emission order into the backward compaction ring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.core.camera import Camera
from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.ops.binning import bin_gaussians
from radegs_tpu.ops.pallas_blend import (blend_backward_pallas,
                                         blend_forward_pallas)
from radegs_tpu.ops.pallas_blend_mt import (blend_backward_pallas_mt,
                                            blend_forward_pallas_mt)

W, H = 64, 48  # 4 x 3 = 12 tiles


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    P = 120
    cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 0.9, 0.9, W, H)
    prep = preprocess_gaussians(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.6, jnp.float32),
        jnp.asarray(np.exp(rng.normal(size=(P, 3)) * 0.4 - 1.8), jnp.float32),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (P, 1)),
        jnp.full((P, 1), 0.7),
        jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 1, 3)), jnp.float32),
        sh_degree=0,
        camera=cam,
        kernel_size=0.1,
    )
    binning = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, W, H,
                            instance_budget=1 << 11, max_per_tile=128)
    inputs = (prep.xy, prep.conic, prep.opacity, prep.rgb, prep.view_point,
              prep.camera_plane, prep.ray_plane, prep.normal, prep.ts)
    return binning, inputs


@pytest.mark.parametrize("gbatch", [1, 2, 4, 5])
def test_forward_parity_mt(scene, gbatch):
    """gbatch=1 is the degenerate case; 5 does not divide 12 (grid pad)."""
    binning, inputs = scene
    ref = blend_forward_pallas(binning, *inputs, width=W, height=H, chunk=16,
                               interpret=True)
    mt = blend_forward_pallas_mt(binning, *inputs, width=W, height=H, chunk=16,
                                 gbatch=gbatch, interpret=True)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(mt[k])
        assert (a == b).all(), (k, np.abs(a - b).max() if k != "med_pos" else "")


@pytest.mark.parametrize("gbatch", [2, 4])
@pytest.mark.parametrize("orient", ["mn", "nm"])
def test_backward_parity_mt(scene, gbatch, orient):
    binning, inputs = scene
    fwd = blend_forward_pallas(binning, *inputs, width=W, height=H, chunk=16,
                               interpret=True)
    rng = np.random.default_rng(1)
    cot = {k: jnp.asarray(rng.normal(size=np.asarray(v).shape), jnp.float32)
           for k, v in fwd.items() if k != "med_pos"}
    ref = blend_backward_pallas(binning, inputs, fwd, cot, width=W, height=H,
                                chunk=16, interpret=True, orient=orient)
    mt = blend_backward_pallas_mt(binning, inputs, fwd, cot, width=W, height=H,
                                  chunk=16, gbatch=gbatch, interpret=True,
                                  orient=orient)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(mt[k])
        assert (a == b).all(), (k, np.abs(a - b).max())


def test_backward_raw_ring_parity_mt(scene):
    """The compacted per-instance gradient block itself must be identical —
    the emission-order claim, stronger than reduced-gradient parity."""
    binning, inputs = scene
    fwd = blend_forward_pallas(binning, *inputs, width=W, height=H, chunk=16,
                               interpret=True)
    cot = {k: jnp.ones_like(v) for k, v in fwd.items() if k != "med_pos"}
    ref = blend_backward_pallas(binning, inputs, fwd, cot, width=W, height=H,
                                chunk=16, interpret=True, reduce=False)["raw"]
    mt = blend_backward_pallas_mt(binning, inputs, fwd, cot, width=W, height=H,
                                  chunk=16, gbatch=4, interpret=True,
                                  reduce=False)["raw"]
    # compare the FLUSHED region only: lanes past align_up(total, chunk) are
    # never written (uninitialized garbage, masked by the reduction)
    total = int(np.asarray(binning.tile_count).sum())
    flushed = -(-total // 16) * 16
    a = np.asarray(ref)[:, :flushed]
    b = np.asarray(mt)[:, :flushed]
    assert (a == b).all()

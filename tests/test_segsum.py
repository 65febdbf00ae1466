"""Sort + MXU one-hot segment-sum reduction vs the scatter-add reduction
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radegs_tpu.ops.pallas_blend import N_GRAD, N_GRAD_PAD, _reduce_grad_rows
from radegs_tpu.ops.segsum import reduce_grad_rows_mxu


def _case(P, B_out, total, seed, gid_mode="uniform"):
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(N_GRAD_PAD, B_out)).astype(np.float32)
    if gid_mode == "uniform":
        gid = rng.integers(-1, P, size=B_out)
    elif gid_mode == "runs":
        # long contiguous runs (a few gaussians own most rows — windows and
        # chunk boundaries are crossed many times)
        gid = np.sort(rng.integers(0, max(P // 16, 2), size=B_out))
    else:  # "sparse": ids scattered across the whole [0, P) range
        gid = rng.choice(P, size=min(7, P), replace=False)[
            rng.integers(0, min(7, P), size=B_out)]
    g[N_GRAD] = gid.astype(np.float32)
    # dead lanes (past ``total`` or gid<0) may carry NaN garbage in the real
    # pipeline (degenerate-instance gradients) — the reduction must not let
    # it poison live outputs (NaN*0 = NaN in the one-hot matmul)
    g[: N_GRAD, total:] = np.nan
    g[: N_GRAD, gid < 0] = np.nan
    return jnp.asarray(g), gid


@pytest.mark.parametrize("gid_mode", ["uniform", "runs", "sparse"])
def test_mxu_reduction_matches_scatter(gid_mode):
    P, B_out, total = 700, 4096, 3000
    gi, _ = _case(P, B_out, total, 5, gid_mode)
    want = _reduce_grad_rows(gi, jnp.int32(total), P, seg_rows=B_out)
    got = reduce_grad_rows_mxu(gi, jnp.int32(total), P, win=128, chunk=256,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_mxu_reduction_numpy_oracle():
    P, B_out, total = 37, 1024, 900
    gi, gid = _case(P, B_out, total, 11)
    got = np.asarray(reduce_grad_rows_mxu(gi, jnp.int32(total), P, win=128,
                                          chunk=128, interpret=True))
    g = np.asarray(gi)
    want = np.zeros((P, N_GRAD), np.float32)
    for i in range(total):
        if 0 <= gid[i] < P:
            want[gid[i]] += g[:N_GRAD, i]
    np.testing.assert_allclose(got.T, want, atol=1e-4)


def test_mxu_reduction_edge_shapes():
    # P not a multiple of win; B_out not a multiple of chunk after the
    # internal pad; total == 0 (all rows dead)
    P, B_out = 130, 640
    gi, _ = _case(P, B_out, 640, 3)
    want = _reduce_grad_rows(gi, jnp.int32(640), P, seg_rows=B_out)
    got = reduce_grad_rows_mxu(gi, jnp.int32(640), P, win=128, chunk=256,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)

    got0 = reduce_grad_rows_mxu(gi, jnp.int32(0), P, win=128, chunk=256,
                                interpret=True)
    assert np.abs(np.asarray(got0)).max() == 0.0


def test_backward_blend_reduce_impl_parity():
    """blend_backward_pallas(reduce_impl="mxu") vs "scatter" end-to-end on a
    small scene (interpret mode)."""
    import jax

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.core.projection import preprocess_gaussians
    from radegs_tpu.ops.binning import bin_gaussians
    from radegs_tpu.ops.pallas_blend import (blend_backward_pallas,
                                             blend_forward_pallas)

    rng = np.random.default_rng(0)
    P, W, H = 120, 64, 48
    cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 0.9, 0.9, W, H)
    prep = preprocess_gaussians(
        jnp.asarray(rng.normal(size=(P, 3)) * 0.6, jnp.float32),
        jnp.asarray(np.exp(rng.normal(size=(P, 3)) * 0.4 - 1.8), jnp.float32),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (P, 1)),
        jnp.full((P, 1), 0.7),
        jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 1, 3)), jnp.float32),
        sh_degree=0, camera=cam, kernel_size=0.1,
    )
    binning = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid,
                            W, H, instance_budget=1 << 11, max_per_tile=128)
    inputs = (prep.xy, prep.conic, prep.opacity, prep.rgb, prep.view_point,
              prep.camera_plane, prep.ray_plane, prep.normal, prep.ts)
    fwd = blend_forward_pallas(binning, *inputs, width=W, height=H, chunk=16,
                               interpret=True)
    cot = {k: (jnp.ones_like(v) if k != "med_pos" else None)
           for k, v in fwd.items()}
    kw = dict(width=W, height=H, chunk=16, interpret=True)
    gs = blend_backward_pallas(binning, inputs, fwd, cot,
                               reduce_impl="scatter", **kw)
    gm = blend_backward_pallas(binning, inputs, fwd, cot,
                               reduce_impl="mxu", **kw)
    for k in gs:
        a, b = np.asarray(gs[k]), np.asarray(gm[k])
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert rel < 1e-5, (k, rel)


@pytest.mark.parametrize("total_frac", [1.0, 0.4, 0.0])
def test_segmented_sort_matches_monolithic(total_frac):
    """seg_rows: per-segment independent sorts + multi-run kernel walk must
    match the monolithic sort, incl. gaussians whose rows span segments and
    fully-dead trailing segments that skip the sort."""
    P, B_out = 300, 4096
    total = int(B_out * total_frac)
    gi, _ = _case(P, B_out, total, 123, "uniform")
    mono = reduce_grad_rows_mxu(gi, jnp.int32(total), P, win=128, chunk=256,
                                interpret=True)
    seg = reduce_grad_rows_mxu(gi, jnp.int32(total), P, win=128, chunk=256,
                               interpret=True, seg_rows=1024)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(mono),
                               rtol=1e-5, atol=1e-4)


def test_searchsorted_query_past_all_keys():
    """Regression: the fixed-unroll binary search must clamp at B when the
    query exceeds every key — the unguarded version returned B+1, making the
    segment walk read one chunk into the NEXT segment (double counts)."""
    from radegs_tpu.ops.segsum import _searchsorted_left

    keys = jnp.asarray(np.sort(np.random.default_rng(0).integers(
        0, 600, 2048)), jnp.int32)
    q = jnp.asarray([0, 512, 1024, 4096], jnp.int32)
    got = np.asarray(_searchsorted_left(keys, q))
    want = np.searchsorted(np.asarray(keys), np.asarray(q), side="left")
    np.testing.assert_array_equal(got, want)


def test_production_config_multi_segment_numpy_oracle():
    """Regression: the win=512/chunk=1024 production config with >=2 LIVE
    segments (the dense-path shape) — exactly the geometry where the
    searchsorted overrun double-counted the next segment's rows."""
    P, B_out, total = 600, 4096, 3000
    gi, gid = _case(P, B_out, total, 3)
    got = np.asarray(reduce_grad_rows_mxu(gi, jnp.int32(total), P, win=512,
                                          chunk=1024, interpret=True,
                                          seg_rows=2048))
    g = np.asarray(gi)
    want = np.zeros((P, N_GRAD), np.float32)
    for i in range(total):
        if 0 <= gid[i] < P:
            want[gid[i]] += g[:N_GRAD, i]
    np.testing.assert_allclose(got.T, want, atol=1e-3)


def test_segmented_sort_numpy_oracle():
    P, B_out, total = 37, 2048, 1500
    gi, gid = _case(P, B_out, total, 9)
    got = np.asarray(reduce_grad_rows_mxu(gi, jnp.int32(total), P, win=128,
                                          chunk=128, interpret=True,
                                          seg_rows=512))
    g = np.asarray(gi)
    want = np.zeros((P, N_GRAD), np.float32)
    for i in range(total):
        if 0 <= gid[i] < P:
            want[gid[i]] += g[:N_GRAD, i]
    np.testing.assert_allclose(got.T, want, atol=1e-4)


@pytest.mark.parametrize("gid_mode", ["uniform", "runs", "sparse"])
def test_scan_reduction_matches_scatter(gid_mode):
    from radegs_tpu.ops.segsum import reduce_grad_rows_scan

    P, B_out, total = 700, 4096, 3000
    gi, _ = _case(P, B_out, total, 7, gid_mode)
    want = _reduce_grad_rows(gi, jnp.int32(total), P, seg_rows=B_out)
    got = reduce_grad_rows_scan(gi, jnp.int32(total), P)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
    # max_run capping (the tile-count bound callers pass): "runs" mode has
    # runs up to ~B/ (P//16); a bound >= that must not change the result
    got_cap = reduce_grad_rows_scan(gi, jnp.int32(total), P, max_run=4096)
    np.testing.assert_array_equal(np.asarray(got_cap), np.asarray(got))


def test_scan_reduction_numpy_oracle_and_edges():
    from radegs_tpu.ops.segsum import reduce_grad_rows_scan

    P, B_out, total = 37, 1024, 900
    gi, gid = _case(P, B_out, total, 13)
    got = np.asarray(reduce_grad_rows_scan(gi, jnp.int32(total), P))
    g = np.asarray(gi)
    want = np.zeros((P, N_GRAD), np.float32)
    for i in range(total):
        if 0 <= gid[i] < P:
            want[gid[i]] += g[:N_GRAD, i]
    np.testing.assert_allclose(got.T, want, atol=1e-4)
    # B_out < P (tiny budgets vs big capacity) and total == 0
    gi2, gid2 = _case(97, 64, 50, 17)
    got2 = np.asarray(reduce_grad_rows_scan(gi2, jnp.int32(50), 97))
    want2 = np.zeros((97, N_GRAD), np.float32)
    g2 = np.asarray(gi2)
    for i in range(50):
        if 0 <= gid2[i] < 97:
            want2[gid2[i]] += g2[:N_GRAD, i]
    np.testing.assert_allclose(got2.T, want2, atol=1e-4)
    got0 = np.asarray(reduce_grad_rows_scan(gi2, jnp.int32(0), 97))
    assert (got0 == 0).all()


def test_scan_reduction_segmented_matches_monolithic():
    """Per-segment scans + exact cross-boundary fixup == the monolithic
    scan, including runs that straddle a segment boundary and trailing
    all-dead segments."""
    from radegs_tpu.ops.segsum import reduce_grad_rows_scan

    P, B_out, total = 50, 2048, 1500
    rng = np.random.default_rng(23)
    g = rng.normal(size=(N_GRAD_PAD, B_out)).astype(np.float32)
    # runs of ~50 rows (< max_run=64 < seg=256) so several straddle a
    # 256-row segment boundary without exceeding the scan bound
    gid = np.sort(rng.integers(0, 40, size=B_out))
    g[N_GRAD] = gid.astype(np.float32)
    g[:N_GRAD, total:] = np.nan
    gi = jnp.asarray(g)
    mono = reduce_grad_rows_scan(gi, jnp.int32(total), P, max_run=64,
                                 seg_rows=1 << 21)
    segd = reduce_grad_rows_scan(gi, jnp.int32(total), P, max_run=64,
                                 seg_rows=256)
    np.testing.assert_allclose(np.asarray(segd), np.asarray(mono),
                               rtol=1e-6, atol=1e-5)
    want = _reduce_grad_rows(gi, jnp.int32(total), P, seg_rows=B_out)
    np.testing.assert_allclose(np.asarray(segd), np.asarray(want),
                               rtol=1e-5, atol=1e-4)

"""Evaluation toolkit: chamfer, Umeyama/ICP alignment, polygon crop,
F-score protocol pieces on synthetic geometry."""

import numpy as np

from radegs_tpu.eval.dtu import chamfer_distance, radius_downsample, sample_mesh_surface
from radegs_tpu.eval.tnt import (
    evaluate_histo,
    evaluate_tnt,
    icp_point_to_point,
    umeyama,
    voxel_downsample,
)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(200, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    s, t = 2.3, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s2, R2, t2 = umeyama(src, dst)
    assert abs(s2 - s) < 1e-6
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_icp_refines_small_offset():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(3000, 3))
    dst = pts + np.array([0.02, -0.01, 0.015])
    T = icp_point_to_point(pts, dst, thresh=0.2)
    aligned = pts @ T[:3, :3].T + T[:3, 3]
    assert np.abs(aligned - dst).max() < 1e-3


def test_fscore_protocol():
    rng = np.random.default_rng(2)
    gt = rng.uniform(size=(5000, 3))
    est = gt + rng.normal(scale=0.002, size=gt.shape)
    r = evaluate_histo(est, gt, tau=0.01)
    assert r["f1"] > 0.95
    r2 = evaluate_histo(est + 0.5, gt, tau=0.01)
    assert r2["f1"] < 0.05


def test_chamfer_and_downsample():
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(4000, 3))
    assert chamfer_distance(a, a) < 1e-12
    d = voxel_downsample(a, 0.2)
    assert 50 < len(d) < 400  # ~5^3 cells occupied
    rd = radius_downsample(a, 0.15)
    from scipy.spatial import cKDTree

    dd, _ = cKDTree(rd).query(rd, k=2, workers=-1)
    assert dd[:, 1].min() >= 0.15 - 1e-9  # blue-noise property


def test_surface_sampling_density():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2]])
    pts = sample_mesh_surface(verts, faces, 0.05)
    # triangle area 0.5 at 0.05 spacing -> a couple hundred samples
    assert 100 < len(pts) < 500
    # all inside the triangle
    assert (pts[:, 0] >= -1e-9).all() and (pts[:, 1] >= -1e-9).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-9).all()


def test_evaluate_tnt_end_to_end():
    rng = np.random.default_rng(4)
    gt = rng.uniform(size=(8000, 3))
    # estimated cloud: rotated+shifted copy; trajectories give the alignment
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.4, 0.1, -0.2])
    inv_R, inv_t = R.T, -R.T @ t
    est = gt @ inv_R.T + inv_t  # so that R @ est + t == gt

    def traj(centers):
        T = np.tile(np.eye(4), (len(centers), 1, 1))
        T[:, :3, 3] = centers
        return T

    c_gt = rng.uniform(size=(20, 3)) * 2
    c_est = (c_gt - t) @ R  # centers in est frame
    r = evaluate_tnt("TestScene", est, gt, est_traj=traj(c_est), gt_traj=traj(c_gt),
                     tau=0.01)
    assert r["f1"] > 0.9, r


def test_evaluate_tnt_two_stage_icp_and_pr_curves(tmp_path):
    """The official protocol's refinement must fix a small residual
    misalignment the trajectory transform misses (run.py:158-162), and the
    cumulative PR curves + txt dumps must be produced (evaluation.py:155-160,
    plot.py:40)."""
    rng = np.random.default_rng(9)
    gt = rng.uniform(size=(9000, 3))
    # est = gt under a small rigid error NOT captured by the trajectories
    ang = 0.04
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.02, -0.015, 0.01])
    est = gt @ R.T + t

    # without ICP the fit is poor at tau=0.005; with the 3-stage refinement
    # it must recover
    r_no = evaluate_tnt("S", est, gt, tau=0.005, icp_refine=False)
    r_icp = evaluate_tnt("S", est, gt, tau=0.005, icp_refine=True,
                         out_dir=str(tmp_path))
    assert r_icp["f1"] > 0.97, r_icp["f1"]
    assert r_icp["f1"] > r_no["f1"] + 0.1, (r_icp["f1"], r_no["f1"])
    # curve arrays present and monotone, ending at ~100%
    for k in ("cum_source", "cum_target"):
        c = r_icp[k]
        assert len(c) > 100 and (np.diff(c) >= 0).all() and c[-1] > 0.95
    import os

    assert os.path.exists(tmp_path / "S.precision.txt")
    assert os.path.exists(tmp_path / "S.recall.txt")
    assert os.path.exists(tmp_path / "S.prf_tau_plotstr.txt")
    assert os.path.exists(tmp_path / "S_results.json")

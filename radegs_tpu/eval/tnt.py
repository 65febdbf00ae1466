"""Tanks & Temples F-score evaluation (the eval_tnt/ toolbox protocol).

NumPy/SciPy re-implementation of the official pipeline (eval_tnt/run.py:
58-120): camera-trajectory alignment (Umeyama similarity), uniform + voxel
downsampling, point-to-point ICP refinement (registration.py:134-201),
polygon-volume cropping, and EvaluateHisto precision/recall/F1 at the
per-scene tau (evaluation.py:60-171, config.py:33-41).
"""

from __future__ import annotations

import json
import os

import numpy as np
from scipy.spatial import cKDTree

# per-scene distance thresholds tau (eval_tnt/config.py:33-41)
SCENE_TAU = {
    "Barn": 0.01, "Caterpillar": 0.005, "Church": 0.025, "Courthouse": 0.025,
    "Ignatius": 0.003, "Meetingroom": 0.01, "Truck": 0.005,
}


def read_trajectory_log(path):
    """Read a TNT .log camera trajectory -> (N,4,4) c2w (trajectory_io.py)."""
    mats = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        rows = [list(map(float, lines[i + 1 + k].split())) for k in range(4)]
        mats.append(np.array(rows))
        i += 5
    return np.stack(mats)


def umeyama(src, dst, with_scale=True):
    """Least-squares similarity transform src -> dst: returns (s, R, t)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def icp_point_to_point(src, dst, init=np.eye(4), max_iter=20, thresh=0.05,
                       sample=200_000, seed=0):
    """Simple point-to-point ICP refinement (registration.py:134-201 role)."""
    rng = np.random.default_rng(seed)
    if len(src) > sample:
        src = src[rng.choice(len(src), sample, replace=False)]
    if len(dst) > sample:
        dst = dst[rng.choice(len(dst), sample, replace=False)]
    tree = cKDTree(dst)
    T = init.copy()
    for _ in range(max_iter):
        cur = src @ T[:3, :3].T + T[:3, 3]
        d, idx = tree.query(cur, workers=-1)
        ok = d < thresh
        if ok.sum() < 10:
            break
        _, R, t = umeyama(cur[ok], dst[idx[ok]], with_scale=False)
        dT = np.eye(4)
        dT[:3, :3], dT[:3, 3] = R, t
        T = dT @ T
        if np.abs(dT - np.eye(4)).max() < 1e-7:
            break
    return T


def align_trajectories(est_c2w, gt_c2w):
    """Similarity transform mapping estimated camera centers onto GT
    (registration.py:66-111 trajectory alignment)."""
    c_est = est_c2w[:, :3, 3]
    c_gt = gt_c2w[:, :3, 3]
    n = min(len(c_est), len(c_gt))
    s, R, t = umeyama(c_est[:n], c_gt[:n], with_scale=True)
    T = np.eye(4)
    T[:3, :3] = s * R
    T[:3, 3] = t
    return T


def crop_polygon_volume(points, crop_json):
    """Open3D SelectionPolygonVolume crop (.json with orthogonal_axis "Z",
    axis_min/max, bounding_polygon)."""
    with open(crop_json) as f:
        vol = json.load(f)
    poly = np.asarray(vol["bounding_polygon"])[:, :2]
    zmin, zmax = vol["axis_min"], vol["axis_max"]
    ok_z = (points[:, 2] >= zmin) & (points[:, 2] <= zmax)
    # even-odd ray casting in the XY plane
    x, y = points[:, 0], points[:, 1]
    inside = np.zeros(len(points), bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        cond = ((y1 > y) != (y2 > y)) & (
            x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-30) + x1
        )
        inside ^= cond
    return points[inside & ok_z]


def voxel_downsample(points, voxel):
    """Mean-of-voxel downsampling (open3d voxel_down_sample equivalent)."""
    keys = np.floor(points / voxel).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((counts.shape[0], 3))
    np.add.at(sums, inv, points)
    return sums / counts[:, None]


def evaluate_histo(est, gt, tau):
    """EvaluateHisto core (evaluation.py:60-171): precision/recall/F at tau
    plus distance quantiles."""
    d_e2g, _ = cKDTree(gt).query(est, workers=-1)
    d_g2e, _ = cKDTree(est).query(gt, workers=-1)
    precision = float((d_e2g < tau).mean())
    recall = float((d_g2e < tau).mean())
    fscore = 2 * precision * recall / max(precision + recall, 1e-12)
    return {
        "precision": precision,
        "recall": recall,
        "f1": fscore,
        "mean_e2g": float(d_e2g.mean()),
        "mean_g2e": float(d_g2e.mean()),
        "median_e2g": float(np.median(d_e2g)),
        "median_g2e": float(np.median(d_g2e)),
    }


def evaluate_tnt(scene_name, est_points, gt_points, est_traj=None, gt_traj=None,
                 crop_json=None, tau=None, dTau_voxel=None, icp_refine=True,
                 out_dir=None):
    """Full protocol (eval_tnt/run.py:58-120): align (trajectory Umeyama +
    ICP), crop, voxel-downsample at tau, EvaluateHisto."""
    tau = tau if tau is not None else SCENE_TAU.get(scene_name, 0.01)
    voxel = dTau_voxel if dTau_voxel is not None else tau

    T = np.eye(4)
    if est_traj is not None and gt_traj is not None:
        T = align_trajectories(est_traj, gt_traj)
    est = est_points @ T[:3, :3].T + T[:3, 3]
    if icp_refine:
        T2 = icp_point_to_point(est, gt_points, thresh=tau * 20)
        est = est @ T2[:3, :3].T + T2[:3, 3]
    if crop_json is not None:
        est = crop_polygon_volume(est, crop_json)
        gt_points = crop_polygon_volume(gt_points, crop_json)
    est = voxel_downsample(est, voxel)
    gt_d = voxel_downsample(gt_points, voxel)
    result = {"scene": scene_name, "tau": tau, **evaluate_histo(est, gt_d, tau)}
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{scene_name}_results.json"), "w") as f:
            json.dump(result, f, indent=2)
    return result

"""PnP pose solvers + multi-view triangulation + prediction seeding.

Covers the vision-side pose machinery the reference implements in
feature_manager.cpp:215-300 (initFramePoseByPnP/solvePoseByPnP), :379-431
(multi-view SVD triangulation) and estimator.cpp:1694-1739
(predictPtsInNextFrame).
"""

import numpy as np
import pytest

from cerberus_tpu.estimator import pnp
from cerberus_tpu.estimator.feature_manager import (FeatureManager,
                                                    _multiview_depth)


def _rand_rot(rng, scale=1.0):
    w = rng.normal(size=3) * scale
    return pnp._exp_so3(w)


def _make_scene(rng, n=40, noise=0.0):
    pts3d = rng.uniform([-3, -3, 3], [3, 3, 10], size=(n, 3))
    R_wc = _rand_rot(rng, 0.2)
    t_wc = rng.normal(size=3) * 0.5
    uv, z = pnp.project(R_wc, t_wc, pts3d)
    uv = uv + rng.normal(size=uv.shape) * noise
    return pts3d, uv, R_wc, t_wc


def test_pnp_gn_recovers_pose(rng):
    pts3d, uv, R_true, t_true = _make_scene(rng, noise=0.0)
    # seed within typical inter-frame motion
    R0 = R_true @ _rand_rot(rng, 0.05)
    t0 = t_true + rng.normal(size=3) * 0.05
    R, t, ok, rms = pnp.solve_pnp_gn(pts3d, uv, R0, t0)
    assert ok
    assert np.linalg.norm(t - t_true) < 1e-6
    assert np.allclose(R, R_true, atol=1e-6)


def test_pnp_gn_with_noise_and_huber_outliers(rng):
    pts3d, uv, R_true, t_true = _make_scene(rng, n=80, noise=0.5 / 460.0)
    uv[:8] += rng.normal(size=(8, 2)) * 0.2  # gross outliers
    R, t, ok, rms = pnp.solve_pnp_gn(pts3d, uv, R_true, t_true + 0.03)
    assert ok
    assert np.linalg.norm(t - t_true) < 0.02


def test_ransac_pnp_seed_free_recovery(rng):
    """DLT+RANSAC recovers the pose with NO initial guess and 25% outliers —
    the recovery case the reference's cv::solvePnP(iterative) cannot handle."""
    pts3d, uv, R_true, t_true = _make_scene(rng, n=60, noise=0.3 / 460.0)
    n_out = 15
    uv[:n_out] = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    res = pnp.ransac_pnp(pts3d, uv)
    assert res is not None
    R, t, inl = res
    assert np.linalg.norm(t - t_true) < 0.02
    assert inl[n_out:].mean() > 0.9


def test_dlt_pose_exact(rng):
    pts3d, uv, R_true, t_true = _make_scene(rng, n=20, noise=0.0)
    R, t = pnp.dlt_pose(pts3d, uv)
    assert np.linalg.norm(t - t_true) < 1e-8
    assert np.allclose(R, R_true, atol=1e-8)


# ---------------------------------------------------------------------------


def _window_scene(rng, nf=6, nfeat=30, noise=0.0):
    """Poses moving along x with landmarks ahead; observations per frame."""
    p_w = np.stack([np.array([0.12 * i, 0.02 * i, 0.3]) for i in range(11)])
    R_w = np.stack([_rand_rot(rng, 0.02) for _ in range(11)])
    ric = np.stack([np.eye(3), np.eye(3)])
    # cameras look along +z of camera = +x of body via the usual VIO mount
    Rc = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    ric = np.stack([Rc, Rc])
    tic = np.stack([[0.1, 0.025, 0.11], [0.1, -0.025, 0.11]])
    lms = rng.uniform([2.0, -2, -0.5], [8.0, 2, 2.0], size=(nfeat, 3))
    obs = {}
    for f in range(nf):
        Rcam = R_w[f] @ ric[0]
        tcam = R_w[f] @ tic[0] + p_w[f]
        uv, z = pnp.project(Rcam, tcam, lms)
        obs[f] = uv + rng.normal(size=uv.shape) * noise
    return p_w, R_w, tic, ric, lms, obs


def test_multiview_depth_matches_truth(rng):
    p_w, R_w, tic, ric, lms, obs = _window_scene(rng, nf=6, noise=0.2 / 460.0)
    fm = FeatureManager(64)
    for f in range(6):
        feats = {i: (np.array([*obs[f][i], 1.0]), np.zeros(2), None,
                     np.zeros(2)) for i in range(len(lms))}
        fm.add_frame(f, feats)
    fm.triangulate(p_w, R_w, tic, ric)
    rel = []
    for s in np.nonzero(fm.active)[0]:
        Rcam = R_w[0] @ ric[0]
        tcam = R_w[0] @ tic[0] + p_w[0]
        z_true = (Rcam.T @ (lms[int(fm.ids[s])] - tcam))[2]
        assert fm.depth[s] > 0
        rel.append(abs(1.0 / fm.depth[s] - z_true) / z_true)
    # far landmarks (z up to ~8 m) over a ~0.6 m baseline are depth-limited;
    # median must be tight, worst case bounded by geometry
    assert np.median(rel) < 0.02
    assert max(rel) < 0.15


def test_multiview_beats_twoview_with_noise(rng):
    """Multi-view SVD over 6 frames should be more accurate than the
    first/last two-view DLT under pixel noise."""
    p_w, R_w, tic, ric, lms, obs = _window_scene(rng, nf=6, noise=1.0 / 460.0)
    frames = np.arange(6)
    err_mv, err_2v = [], []
    Rcam0 = R_w[0] @ ric[0]
    tcam0 = R_w[0] @ tic[0] + p_w[0]
    for i in range(len(lms)):
        pts = np.zeros((11, 3))
        for f in frames:
            pts[f] = [*obs[f][i], 1.0]
        z_true = (Rcam0.T @ (lms[i] - tcam0))[2]
        z_mv = _multiview_depth(pts, frames, 0, p_w, R_w, tic[0], ric[0])
        z_2v = _multiview_depth(pts, np.array([0, 5]), 0, p_w, R_w, tic[0],
                                ric[0])
        err_mv.append(abs(z_mv - z_true))
        err_2v.append(abs(z_2v - z_true))
    assert np.median(err_mv) <= np.median(err_2v)


def test_init_frame_pose_by_pnp(rng):
    p_w, R_w, tic, ric, lms, obs = _window_scene(rng, nf=6, noise=0.3 / 460.0)
    fm = FeatureManager(64)
    for f in range(6):
        feats = {i: (np.array([*obs[f][i], 1.0]), np.zeros(2), None,
                     np.zeros(2)) for i in range(len(lms))}
        fm.add_frame(f, feats)
    # depths from the first 5 frames only
    fm.triangulate(p_w, R_w, tic, ric)
    # corrupt frame 5's pose badly; PnP must recover it from depths
    p_bad = p_w.copy()
    R_bad = R_w.copy()
    p_bad[5] += [0.8, -0.5, 0.3]
    res = fm.init_frame_pose_by_pnp(5, p_bad, R_bad, tic, ric)
    assert res is not None
    p_new, R_new = res
    assert np.linalg.norm(p_new - p_w[5]) < 0.02
    assert np.allclose(R_new, R_w[5], atol=0.01)

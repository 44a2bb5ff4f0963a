"""Replay driver: stream a dataset through the estimator and evaluate drift.

The reference's integration test is rosbag replay with CSV output every 50
frames (reference: main.cpp:95-202); here the simulator (or a packed dataset)
is streamed sample-by-sample through `Estimator` and the trajectory is scored
against ground truth: ATE RMSE and drift % of distance traveled — the
headline Cerberus metric (README.md:4, <1 % drift).
"""

from __future__ import annotations

import numpy as np

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.estimator.estimator import Estimator


def replay(sim: dict, cfg: EstimatorConfig | None = None,
           est: Estimator | None = None, max_frames: int | None = None,
           csv_path: str | None = None) -> dict:
    """Feed simulator output through the estimator.

    Returns dict with est_t, est_p, est_q, gt_p, ate_rmse, drift_pct,
    distance, and the estimator instance.
    """
    est = est or Estimator(cfg)
    t = sim["t"]
    cam_idx = set(int(i) for i in sim["cam_idx"])
    cam_lookup = {int(k): f for k, f in zip(sim["cam_idx"], sim["features"])}
    if max_frames is not None:
        allowed = sorted(cam_idx)[:max_frames]
        cam_idx = set(allowed)

    est_t, est_p, est_q, gt_p = [], [], [], []
    rows = []
    for k in range(len(t)):
        est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                          sim["dphi"][k], sim["contacts"][k])
        if k in cam_idx:
            est.input_image(t[k], cam_lookup[k])
            if est.solver_flag == Estimator.NON_LINEAR:
                p, q = est.pose
                est_t.append(t[k])
                est_p.append(p)
                est_q.append(q)
                gt_p.append(sim["p"][k])
                rows.append([t[k], *p, *q, *est.velocity, *sim["p"][k],
                             *est.rho[-1]])

    est_p = np.array(est_p) if est_p else np.zeros((0, 3))
    gt_p = np.array(gt_p) if gt_p else np.zeros((0, 3))

    metrics = score(est_p, gt_p)
    if csv_path and rows:
        header = ("t,px,py,pz,qw,qx,qy,qz,vx,vy,vz,gtx,gty,gtz,"
                  "rho1,rho2,rho3,rho4")
        np.savetxt(csv_path, np.array(rows), delimiter=",", header=header)
    return dict(est_t=np.array(est_t), est_p=est_p, est_q=est_q, gt_p=gt_p,
                estimator=est, **metrics)


def score(est_p: np.ndarray, gt_p: np.ndarray) -> dict:
    """ATE after aligning the first pose (position only) + drift %."""
    if len(est_p) < 2:
        return dict(ate_rmse=np.inf, drift_pct=np.inf, distance=0.0)
    # align first positions (yaw gauge is already shared: estimator starts
    # yaw-aligned with truth by construction of g2R)
    off = gt_p[0] - est_p[0]
    err = est_p + off - gt_p
    ate = float(np.sqrt(np.mean(np.sum(err ** 2, axis=1))))
    dist = float(np.sum(np.linalg.norm(np.diff(gt_p, axis=0), axis=1)))
    final_err = float(np.linalg.norm(err[-1]))
    drift = 100.0 * final_err / max(dist, 1e-9)
    return dict(ate_rmse=ate, drift_pct=drift, distance=dist,
                final_err=final_err)

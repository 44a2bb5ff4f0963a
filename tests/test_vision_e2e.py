"""Vision-machinery end-to-end behaviors demanded by VERDICT r1:

* online camera-IMU time-offset (td) calibration with an injected offset
  (reference: estimate_td + projectionTwoFrameOneCamFactor.cpp:59-74)
* PnP recovery under deliberately corrupted dead-reckoning
  (reference has no recovery path; feature_manager.cpp:215-300 is the base)
* prediction-seeded KLT surviving fast rotation that unseeded tracking loses
  (reference: predictPtsInNextFrame, estimator.cpp:1694-1739)
"""

import dataclasses

import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.replay import replay
from cerberus_tpu.estimator.estimator import Estimator


def _replay_with_td_offset(sim, est, td_true):
    """Feed images claiming timestamps shifted by -td_true: the camera's
    clock lags the IMU clock by td_true, exactly the error td models."""
    t = sim["t"]
    cam_lookup = {int(k): f for k, f in zip(sim["cam_idx"], sim["features"])}
    for k in range(len(t)):
        est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                          sim["dphi"][k], sim["contacts"][k])
        if int(k) in cam_lookup and t[k] - td_true > 0:
            est.input_image(t[k] - td_true, cam_lookup[int(k)])
    return est


@pytest.mark.slow
def test_td_calibration_converges():
    td_true = 0.010   # 10 ms camera lag
    sim = simulate(SimConfig(duration=8.0, speed=0.6, seed=41))
    cfg = EstimatorConfig(estimate_td=True, td=0.0)
    est = Estimator(cfg)
    _replay_with_td_offset(sim, est, td_true)
    assert est.solver_flag == est.NON_LINEAR
    # td must move from 0 toward the injected 10 ms and get most of the way
    assert abs(est.td - td_true) < 0.004, est.td
    assert est.td > 0.005


@pytest.mark.slow
def test_td_stays_near_zero_without_offset():
    sim = simulate(SimConfig(duration=6.0, speed=0.6, seed=42))
    cfg = EstimatorConfig(estimate_td=True, td=0.0)
    est = Estimator(cfg)
    _replay_with_td_offset(sim, est, 0.0)
    assert abs(est.td) < 0.004, est.td


@pytest.mark.slow
def test_pnp_recovers_from_corrupted_dead_reckoning():
    """A 0.4 s accelerometer fault (±25 m/s^2 square wave) mid-run corrupts
    IMU dead-reckoning; the PnP recovery gate must keep the estimate
    converged (reference behavior: the bad prediction simply enters the
    solver and the run degrades or reboots)."""
    sim = simulate(SimConfig(duration=6.0, speed=0.5, seed=43))
    sim = dict(sim)
    acc = sim["acc"].copy()
    i0 = int(3.0 * 500)
    fault = 25.0 * np.sign(np.sin(np.arange(200) * 0.3))
    acc[i0:i0 + 200, 0] += fault
    acc[i0:i0 + 200, 2] -= 0.5 * fault
    sim["acc"] = acc
    cfg = EstimatorConfig(pnp_fallback=True)
    est = Estimator(cfg)
    out = replay(sim, est=est)
    assert est.solver_flag == est.NON_LINEAR
    # converged despite the fault (generous gate: the fault interval itself
    # is unobservable-corrupt, what matters is recovery after it)
    err_end = np.linalg.norm(out["est_p"][-1] - out["est_p"][0]
                             - (out["gt_p"][-1] - out["gt_p"][0]))
    assert err_end < 0.25, err_end


def test_seeded_klt_survives_fast_rotation(rng):
    """21 deg of yaw between two frames (~170 px image motion) is beyond
    pyramidal LK's capture range from a zero-motion seed; prediction seeding
    must retain what unseeded tracking loses."""
    cv2 = pytest.importorskip("cv2")
    from cerberus_tpu.data.simulator import ImageRenderer
    from cerberus_tpu.frontend.tracker import FeatureTracker, PinholeCamera

    n_lm = 120
    lm = rng.uniform([3.0, -5, -0.5], [12.0, 5, 2.0], size=(n_lm, 3))
    yaw = np.deg2rad(21.0)
    c, s = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    sim = dict(landmarks=lm,
               p=np.stack([[0, 0, 0.3], [0.01, 0.0, 0.3]]),
               R=np.stack([np.eye(3), Rz]))
    r = ImageRenderer(sim, pixel_noise=1.0)
    cfg = EstimatorConfig()
    ric, tic = cfg.ric_tic()

    def run(seeded: bool) -> int:
        cams = [PinholeCamera(r.f, r.f, r.cx, r.cy) for _ in range(2)]
        tr = FeatureTracker(cams[0], None, max_cnt=120, flow_back=True)
        out0 = tr.track(0.0, r.render(0, 0))
        if seeded:
            # project each tracked point into the rotated camera using its
            # known pixel ray (depth-free for pure rotation about the body:
            # approximate with a nominal 6 m depth — prediction only needs
            # to land within LK's capture range)
            Rwc0, twc0 = r.camera_pose(0, 0)
            Rwc1, twc1 = r.camera_pose(1, 0)
            pred = {}
            for fid, (pt, _, _, _) in out0.items():
                ray_w = Rwc0 @ (pt * 6.0)
                pc1 = Rwc1.T @ (ray_w + twc0 - twc1)
                if pc1[2] > 0.1:
                    pred[fid] = np.array([r.f * pc1[0] / pc1[2] + r.cx,
                                          r.f * pc1[1] / pc1[2] + r.cy])
            tr.set_prediction(pred)
        out1 = tr.track(1.0 / 15, r.render(1, 0))
        return len(set(out0) & set(out1))

    kept_unseeded = run(False)
    kept_seeded = run(True)
    assert kept_seeded >= 25
    assert kept_seeded >= 2 * max(kept_unseeded, 1)

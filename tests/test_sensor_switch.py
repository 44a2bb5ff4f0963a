"""Runtime sensor hot-swap (reference: changeSensorType,
estimator.cpp:175-212) and vision-only solving."""

import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.replay import replay
from cerberus_tpu.estimator.estimator import Estimator


def test_guard_rejects_no_sensors():
    est = Estimator(EstimatorConfig())
    with pytest.raises(ValueError):
        est.change_sensor_type(False, False)


def test_reenabling_imu_restarts():
    est = Estimator(EstimatorConfig())
    est.change_sensor_type(False, True)
    assert not est.cfg.use_imu
    assert est.prior is None
    r0 = est.stats["reboots"]
    est.change_sensor_type(True, True)
    assert est.cfg.use_imu
    assert est.stats["reboots"] == r0 + 1
    assert est.frame_count == 0 and est.solver_flag == est.INITIAL


@pytest.mark.slow
def test_mono_swap_mid_run():
    """Dropping to mono mid-run keeps the estimator converged (right-cam
    observations are discarded; mono projection factors carry on)."""
    sim = simulate(SimConfig(duration=6.0, speed=0.5, seed=51))
    est = Estimator(EstimatorConfig())
    t = sim["t"]
    cam_lookup = {int(k): f for k, f in zip(sim["cam_idx"], sim["features"])}
    for k in range(len(t)):
        est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                          sim["dphi"][k], sim["contacts"][k])
        if int(k) in cam_lookup:
            if abs(t[k] - 3.0) < 1e-9 or (t[k] > 3.0 and est.cfg.stereo):
                est.change_sensor_type(True, False)
            est.input_image(t[k], cam_lookup[int(k)])
    assert not est.cfg.stereo
    assert est.solver_flag == est.NON_LINEAR
    assert est.stats["reboots"] == 0
    # still tracking: the estimate stayed near truth
    p, _ = est.pose
    k_last = max(k for k in cam_lookup if k < len(t))
    gt = sim["p"][k_last] - sim["p"][0]
    # est.pose is world-frame with the origin at initialization (same
    # convention replay() scores against); est.p[0] is the oldest frame of
    # the CURRENT window, not the origin.
    assert np.linalg.norm(p - gt) < 0.5, (p, gt)


@pytest.mark.slow
def test_vision_only_mode_runs():
    """use_imu=False: PnP seeds every frame pose, the solve carries only
    projection factors + prior (the reference's commented-out 'stereo only'
    path, estimator.cpp:775-790, made live)."""
    sim = simulate(SimConfig(duration=5.0, speed=0.5, seed=52))
    cfg = EstimatorConfig(use_imu=False, use_leg_odom=False,
                          optimize_leg_bias=False, estimate_extrinsic=False,
                          estimate_td=False)
    est = Estimator(cfg)
    out = replay(sim, est=est)
    assert est.solver_flag == est.NON_LINEAR
    assert est.stats["solves"] > 10
    # stereo-only odometry is far weaker than VILO; require sane tracking
    assert out["ate_rmse"] < 0.5
    assert out["drift_pct"] < 10.0

"""End-to-end estimator replay test (the framework's 'rosbag replay').

Streams simulated sensor data through the full pipeline — buffering,
preintegration, feature management, init, window solves, marginalization,
sliding — and checks the headline metric: drift % of distance traveled
(reference claims <1 %, README.md:4)."""

import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.replay import replay


@pytest.mark.slow
def test_replay_low_drift():
    sim = simulate(SimConfig(duration=3.0, speed=0.5, seed=5))
    out = replay(sim, max_frames=20)
    est = out["estimator"]
    assert est.solver_flag == est.NON_LINEAR
    assert est.stats["solves"] >= 5
    assert out["distance"] > 0.2
    # on a ~0.3 m segment the drift %% is mm-noise dominated; the meaningful
    # short-run check is absolute ATE (long-run drift is tracked by bench)
    assert out["ate_rmse"] < 0.015, out["ate_rmse"]  # mm-scale; CPU-thread
    # reduction order makes the exact value run-dependent near 0.01.
    # drift%% over a ~0.37 m segment is dominated by cm-scale noise and the
    # simulator's foot slip, not by actual odometric drift — the long-run
    # drift claim is tracked by evals/run_configs.py over 8+ s
    assert out["drift_pct"] < 10.0, out["drift_pct"]
    # biases pulled toward truth
    assert abs(est.bg[5][2] - sim["gyr_bias"][2]) < 0.01
    # kinematic calibration stays near nominal
    assert np.all(np.abs(est.rho - 0.21) < 0.02)


@pytest.mark.slow
def test_replay_handles_non_keyframes():
    """Slow walk => low parallax => MARGIN_SECOND_NEW path must be exercised
    without corrupting the window."""
    sim = simulate(SimConfig(duration=3.0, speed=0.15, seed=7))
    out = replay(sim, max_frames=20)
    est = out["estimator"]
    assert est.stats["keyframes"] < 20  # some non-keyframes occurred
    assert np.isfinite(out["ate_rmse"])
    # slow walk: low parallax means vision adds little, and the simulated
    # foot slip dominates over the short distance — this test guards the
    # MARGIN_SECOND_NEW bookkeeping, not long-run accuracy
    assert out["ate_rmse"] < 0.15


@pytest.mark.slow
def test_replay_go1_contact_type2():
    """Go1-style config: raw foot forces as contact source (sigmoid contact
    model in the preintegration), leg-bias optimization off — the reference's
    go1 yaml settings (contact_sensor_type 2, optimize_leg_bias 0)."""
    import dataclasses

    cfg = dataclasses.replace(EstimatorConfig(), contact_sensor_type=2,
                              optimize_leg_bias=False)
    sim = simulate(SimConfig(duration=3.0, speed=0.5, seed=9))
    out = replay(sim, cfg=cfg, max_frames=20)
    est = out["estimator"]
    assert est.solver_flag == est.NON_LINEAR
    assert est.stats["reboots"] == 0
    assert out["ate_rmse"] < 0.03, out["ate_rmse"]
    # leg bias must stay frozen
    assert np.all(est.rho == 0.21)


@pytest.mark.slow
def test_replay_ekf_contact_source():
    """Contact source 0: EKF contact probabilities feed the estimator
    (reference: main.cpp:319-321 kf.get_contacts())."""
    from cerberus_tpu.frontend import LeggedEKF

    cfg = EstimatorConfig()  # contact_sensor_type = 0
    sim = simulate(SimConfig(duration=3.0, speed=0.5, seed=5))
    ekf = LeggedEKF(cfg, filter_window=4)
    out = replay(sim, cfg=cfg, max_frames=20, ekf=ekf)
    est = out["estimator"]
    assert est.solver_flag == est.NON_LINEAR
    assert out["ate_rmse"] < 0.03, out["ate_rmse"]


@pytest.mark.slow
def test_rho_calibration_converges():
    """Online kinematic calibration — the reference's RA-L 2022 headline
    capability: with the true calf length 5 mm longer than the estimator's
    nominal, the streaming rho estimate must move decisively toward truth
    (reference: RHO_OPT per-leg leg bias in the window, parameters.h:96)."""
    import dataclasses

    cfg = EstimatorConfig()
    robot = dataclasses.replace(cfg.robot, lower_leg_length=0.215)
    sim = simulate(SimConfig(duration=5.0, speed=0.5, seed=24),
                   EstimatorConfig(robot=robot))
    out = replay(sim, cfg=cfg)
    est = out["estimator"]
    assert est.stats["reboots"] == 0
    rho_mean = float(np.mean(est.rho[10]))
    # starts at 0.210, truth 0.215: must recover at least half the error
    assert rho_mean > 0.2125, rho_mean
    assert out["drift_pct"] < 2.0


def test_restart_semantics():
    """clearState must fully reset (reference: /vins_restart, main.cpp:236)."""
    from cerberus_tpu.estimator.estimator import Estimator

    est = Estimator(EstimatorConfig())
    est.input_imu_leg(0.0, np.array([0, 0, 9.805]), np.zeros(3),
                      np.tile([0.0, 0.8, -1.6], 4), np.zeros(12), np.ones(4))
    est.clear_state()
    assert est.frame_count == 0
    assert est.solver_flag == est.INITIAL
    assert est.prior is None
    assert est.fm.active.sum() == 0

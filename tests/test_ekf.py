"""Legged EKF tests: drift-free velocity/position tracking on simulated data
(the reference's config 1 bring-up target: 'IMU + leg-kinematics EKF only',
BASELINE.json)."""

import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.frontend import LeggedEKF
from cerberus_tpu.utils.filters import MovingWindowFilter


def run_ekf(sim, n=None):
    ekf = LeggedEKF(EstimatorConfig(), filter_window=4)
    t = sim["t"]
    n = n or len(t)
    # warm up the input filters, then init with a gravity-aligned attitude
    ekf.init_filter(t[0], sim["acc"][0], sim["gyr"][0], sim["phi"][0])
    ps, vs = [], []
    for k in range(1, n):
        ekf.update_filter(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                          dphi=sim["dphi"][k],
                          foot_force=sim["foot_forces"][k])
        st = ekf.get_state()
        ps.append(st[0:3])
        vs.append(st[3:6])
    return np.array(ps), np.array(vs), ekf


@pytest.mark.slow
def test_ekf_tracks_velocity_and_position():
    sim = simulate(SimConfig(duration=4.0, speed=0.5, seed=11))
    n = 1800
    ps, vs, ekf = run_ekf(sim, n=n)
    gt_p = sim["p"][1:n] - sim["p"][0]
    gt_v = sim["v"][1:n]
    # velocity error (after transient)
    verr = np.linalg.norm(vs[500:] - gt_v[500:len(vs)], axis=1)
    assert np.median(verr) < 0.1, np.median(verr)
    # position drift over ~3 s of walking (<8% of distance); align at k=500
    # because the EKF height is referenced to the ground plane (z3 meas), not
    # to the body start
    dist = np.sum(np.linalg.norm(np.diff(gt_p[500:len(ps)], axis=0), axis=1))
    perr = np.linalg.norm((ps[-1] - ps[500]) - (gt_p[len(ps) - 1] - gt_p[500]))
    assert perr / dist < 0.08, (perr, dist)


def test_ekf_contact_estimation():
    sim = simulate(SimConfig(duration=1.0, speed=0.5, seed=12))
    ekf = LeggedEKF(EstimatorConfig(), filter_window=4)
    ekf.init_filter(sim["t"][0], sim["acc"][0], sim["gyr"][0], sim["phi"][0])
    hits = 0
    total = 0
    for k in range(1, 400):
        ekf.update_filter(sim["t"][k], sim["acc"][k], sim["gyr"][k],
                          sim["phi"][k], dphi=sim["dphi"][k],
                          foot_force=sim["foot_forces"][k])
        c = ekf.get_contacts()
        hits += np.sum((c > 0.5) == (sim["contacts"][k] > 0.5))
        total += 4
    assert hits / total > 0.85, hits / total


def test_moving_window_filter():
    f = MovingWindowFilter(5, 2)
    xs = np.arange(20).reshape(10, 2).astype(float)
    for i, x in enumerate(xs):
        avg = f.update(x)
        lo = max(0, i - 4)
        np.testing.assert_allclose(avg, xs[lo:i + 1].mean(axis=0), atol=1e-12)

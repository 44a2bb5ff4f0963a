#!/usr/bin/env python
"""Self-consistency check of the simulator: midpoint dead-reckoning of the
NOISE-FREE IMU signals must reproduce the true trajectory; leg odometry
velocity from true joints must match true body velocity during stance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.simulator import _fk_np, _jac_np

cfg = SimConfig(duration=4.0, speed=0.5, seed=5,
                foot_slip_sigma=0.0, foot_slip_forward_bias=0.0,
                late_contact_frac=0.0)
est_cfg = EstimatorConfig()
sim = simulate(cfg, est_cfg)
t = sim["t"]
dt = t[1] - t[0]
N = len(t)
g = sim["gravity"]


def qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def qrot(q, v):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    return R @ v


# ---- IMU dead-reckoning with true signals ----
acc, gyr = sim["acc_true"], sim["gyr_true"]
q = sim["q"][0].copy()
p = sim["p"][0].copy()
v = sim["v"][0].copy()
max_qerr = 0.0
for k in range(1, N):
    un_gyr = 0.5 * (gyr[k - 1] + gyr[k])
    th = un_gyr * dt
    dq = np.concatenate([[1.0], th / 2])
    dq /= np.linalg.norm(dq)
    q_new = qmul(q, dq)
    q_new /= np.linalg.norm(q_new)
    a0 = qrot(q, acc[k - 1]) - g
    a1 = qrot(q_new, acc[k]) - g
    a = 0.5 * (a0 + a1)
    p = p + v * dt + 0.5 * a * dt * dt
    v = v + a * dt
    q = q_new
    if k % 500 == 0:
        qe = min(np.linalg.norm(q - sim["q"][k]), np.linalg.norm(q + sim["q"][k]))
        max_qerr = max(max_qerr, qe)
        print(f"t={t[k]:.1f} |p_err|={np.linalg.norm(p - sim['p'][k]):.5f} "
              f"|v_err|={np.linalg.norm(v - sim['v'][k]):.5f} |q_err|={qe:.6f}")

# ---- leg odometry velocity check (true joints, stance legs) ----
robot = est_cfg.robot
rho_fix = robot.rho_fix()
R_br = np.asarray(robot.R_br, float)
p_br = np.asarray(robot.p_br, float)
errs = []
for k in range(0, N, 50):
    Rk = sim["R"][k]
    w = sim["gyr_true"][k]
    for j in range(4):
        if sim["contacts"][k, j] < 0.5:
            continue
        phi = sim["phi_true"][k, 3 * j:3 * j + 3]
        dphi = sim["dphi_true"][k, 3 * j:3 * j + 3]
        fk = _fk_np(phi, sim["rho"][j], rho_fix[j])
        J = _jac_np(phi, sim["rho"][j], rho_fix[j])
        v_leg = -R_br @ J @ dphi - np.cross(w, p_br + R_br @ fk)
        v_body_true = Rk.T @ sim["v"][k]
        errs.append(np.linalg.norm(v_leg - v_body_true))
errs = np.array(errs)
print(f"leg-odom velocity err: med={np.median(errs):.5f} "
      f"p90={np.percentile(errs, 90):.5f} max={errs.max():.5f}")

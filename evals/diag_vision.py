#!/usr/bin/env python
"""Diagnose full-VILO accuracy: instrument the replay, compare each solve's
result against ground truth, and check whether the solver's cost function
prefers the truth (model mismatch) or the estimate (noise-optimal)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pre-imports jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.estimator.estimator import Estimator
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops.solver import SolveOptions, solve_window


def run(vision=True, duration=3.0, seed=5, speed=0.5, max_frames=20):
    sim = simulate(SimConfig(duration=duration, speed=speed, seed=seed))
    cfg = EstimatorConfig()
    est = Estimator(cfg, dtype=jnp.float64)
    est.debug = True
    t = sim["t"]
    cam_lookup = {int(k): f for k, f in zip(sim["cam_idx"], sim["features"])}
    allowed = sorted(cam_lookup)[:max_frames]
    cam_idx = set(allowed)
    imu_idx_of_t = {float(t[k]): k for k in cam_idx}

    # landmark world positions for true-depth computation
    lm = sim["landmarks"]
    ric, tic = cfg.ric_tic()

    records = []
    for k in range(len(t)):
        est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                          sim["dphi"][k], sim["contacts"][k])
        if k in cam_idx:
            feats = cam_lookup[k] if vision else {}
            est.input_image(t[k], feats)
            if est.solver_flag == Estimator.NON_LINEAR:
                # window-wide error: each window frame vs truth at its header
                errs = []
                for i in range(11):
                    ti = est.headers[i]
                    ki = int(round(ti * 500))
                    if ki < len(t):
                        errs.append(np.linalg.norm(est.p[i] - sim["p"][ki]))
                info = getattr(est, "last_info", None)
                rec = dict(t=t[k], newest_err=errs[-1], mean_err=np.mean(errs),
                           cost0=float(info.cost0) if info else np.nan,
                           cost=float(info.cost) if info else np.nan,
                           accepted=int(info.accepted) if info else -1)
                dbg = getattr(est, "last_debug", None)
                if dbg:
                    rec["entry"] = tuple(round(x, 1) for x in dbg["entry"])
                    if "exit" in dbg:
                        rec["exit"] = tuple(round(x, 1) for x in dbg["exit"])
                rec["rho"] = tuple(np.round(est.rho[10], 4))
                rec["bg"] = tuple(np.round(est.bg[10], 4))
                ric0, tic0 = est.cfg.ric_tic()
                from cerberus_tpu.estimator.estimator import _quat_to_rot_np
                rec["ex_deg"] = round(float(np.degrees(np.arccos(np.clip(
                    (np.trace(_quat_to_rot_np(est.qic[0]) @ ric0[0].T) - 1)
                    / 2, -1, 1)))), 3)
                rec["ex_dt"] = round(float(np.linalg.norm(est.tic[0] - tic0[0])), 4)

                # depth error stats for valid features
                if vision:
                    derr = []
                    for s in np.nonzero(est.fm.active)[0]:
                        if est.fm.depth[s] <= 0:
                            continue
                        sf = int(est.fm.start[s])
                        ki_anchor = int(round(est.headers[sf] * 500))
                        if ki_anchor >= len(t):
                            continue
                        lid = int(est.fm.ids[s])
                        Rw = sim["R"][ki_anchor] @ ric[0]
                        tw = sim["R"][ki_anchor] @ tic[0] + sim["p"][ki_anchor]
                        z_true = (Rw.T @ (lm[lid] - tw))[2]
                        if z_true > 0.1:
                            derr.append(abs(1 / est.fm.depth[s] - z_true))
                    rec["depth_err_med"] = float(np.median(derr)) if derr else np.nan
                    rec["n_depths"] = len(derr)
                records.append(rec)
    return est, sim, records


def cost_at_truth(est, sim):
    """Evaluate the current window's cost at the estimate vs at truth
    (gauge-aligned: truth shifted/yawed so frame 0 matches the estimate)."""
    data, feats, slots, depths = est._pack()
    st_est = est._window_state(est.fm.depth_vector(slots))

    # build truth state at the window headers
    kis = [min(int(round(h * 500)), len(sim["t"]) - 1) for h in est.headers]
    p_t = sim["p"][kis]
    q_t = sim["q"][kis]
    v_t = sim["v"][kis]
    # gauge-align truth to the estimate's frame 0 (position + yaw)
    from cerberus_tpu.utils import lie
    yaw_est = float(lie.rot_to_ypr(lie.quat_to_rot(jnp.asarray(est.q[0])))[0])
    yaw_tru = float(lie.rot_to_ypr(lie.quat_to_rot(jnp.asarray(q_t[0])))[0])
    dyaw = np.deg2rad(yaw_est - yaw_tru)
    c, s = np.cos(dyaw), np.sin(dyaw)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    qz = np.array([np.cos(dyaw / 2), 0, 0, np.sin(dyaw / 2)])
    from cerberus_tpu.estimator.estimator import _quat_mul_np
    p_a = (p_t - p_t[0]) @ Rz.T + est.p[0]
    q_a = np.stack([_quat_mul_np(qz, q) for q in q_t])
    v_a = v_t @ Rz.T

    # true depths in anchor frames of the aligned truth
    ric, tic = est.cfg.ric_tic()
    lm = sim["landmarks"]
    d_true = []
    from cerberus_tpu.estimator.estimator import _quat_to_rot_np
    for n, sslot in enumerate(slots):
        sf = int(est.fm.start[sslot])
        ki = kis[sf]
        Rw = sim["R"][ki] @ ric[0]
        tw = sim["R"][ki] @ tic[0] + sim["p"][ki]
        lid = int(est.fm.ids[sslot])
        z = (Rw.T @ (lm[lid] - tw))[2]
        d_true.append(1.0 / max(z, 0.1))
    dfull = np.ones(est.F)
    dfull[: len(d_true)] = d_true

    st_tru = fac.WindowState(
        p=jnp.asarray(p_a), q=jnp.asarray(q_a), v=jnp.asarray(v_a),
        ba=jnp.tile(jnp.asarray(sim["acc_bias"]), (11, 1)),
        bg=jnp.tile(jnp.asarray(sim["gyr_bias"]), (11, 1)),
        rho=jnp.full((11, 4), sim["rho"][0]),
        tic=st_est.tic, qic=st_est.qic, td=st_est.td,
        depth=jnp.asarray(dfull))

    F = est.F
    zero = jnp.zeros((fac.tangent_dim(F),))
    r_est = fac.window_residuals(st_est, zero, data)
    r_tru = fac.window_residuals(st_tru, zero, data)
    c_est = float(fac.robust_cost(r_est, F))
    c_tru = float(fac.robust_cost(r_tru, F))

    # breakdown
    def breakdown(r):
        ileg = float(jnp.sum(r[:310] ** 2)) / 2
        proj = float(jnp.sum(r[310:310 + F * 44] ** 2)) / 2
        prior = float(jnp.sum(r[310 + F * 44:] ** 2)) / 2
        return ileg, proj, prior
    return (c_est, breakdown(r_est)), (c_tru, breakdown(r_tru))


if __name__ == "__main__":
    DUR = float(os.environ.get("DIAG_DUR", "3.0"))
    NFRAMES = int(os.environ.get("DIAG_FRAMES", "20"))
    print("=== vision ON ===")
    est, sim, recs = run(vision=True, duration=DUR, max_frames=NFRAMES)
    for r in recs:
        print({k: (round(v, 5) if isinstance(v, float) else v)
               for k, v in r.items()})
    (ce, be), (ct, bt) = cost_at_truth(est, sim)
    print(f"final window: cost(est)={ce:.3f} [ileg={be[0]:.2f} proj={be[1]:.2f} "
          f"prior={be[2]:.2f}]")
    print(f"              cost(tru)={ct:.3f} [ileg={bt[0]:.2f} proj={bt[1]:.2f} "
          f"prior={bt[2]:.2f}]")

    print("=== vision OFF ===")
    est2, sim2, recs2 = run(vision=False, duration=DUR, max_frames=NFRAMES)
    for r in recs2:
        print({k: (round(v, 5) if isinstance(v, float) else v)
               for k, v in r.items()})

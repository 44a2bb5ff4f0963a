#!/usr/bin/env python
"""Pin down the projection-model inconsistency: (a) perfect-association
window evaluated at exact truth (model consistency check), (b) streaming
estimator's final window evaluated at aligned truth, with residuals broken
down per feature (by anchor frame / slid vs fresh)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops import factors as fac

# ---- (a) perfect association, exact truth ----
cfg = EstimatorConfig()
sim = simulate(SimConfig(duration=3.0, speed=0.5, seed=5))
data, truth, Fa = build_window_from_sim(sim, cfg, kf_stride=1, start_cam=2,
                                        dtype=jnp.float64)
r = np.asarray(fac._proj_residuals(truth, data))  # (F, 11, 4)
n_rows = (np.abs(r) > 0).sum()
cost = 0.5 * (r ** 2).sum()
print(f"(a) perfect assoc @ truth: proj cost={cost:.1f} over {n_rows} nonzero "
      f"rows, rms_px={np.sqrt((r**2).sum()/max(n_rows,1))*1.5:.3f}")

# ---- (b) streaming estimator final window ----
from cerberus_tpu.estimator.estimator import Estimator, _quat_mul_np
from cerberus_tpu.utils import lie

est = Estimator(cfg, dtype=jnp.float64)
t = sim["t"]
cam_lookup = {int(k): f for k, f in zip(sim["cam_idx"], sim["features"])}
allowed = sorted(cam_lookup)[:20]
for k in range(len(t)):
    est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                      sim["dphi"][k], sim["contacts"][k])
    if k in set(allowed):
        est.input_image(t[k], cam_lookup[k])

data, feats, slots, depths = est._pack()
kis = [min(int(round(h * 500)), len(t) - 1) for h in est.headers]
p_t, q_t, v_t = sim["p"][kis], sim["q"][kis], sim["v"][kis]
yaw_est = float(lie.rot_to_ypr(lie.quat_to_rot(jnp.asarray(est.q[0])))[0])
yaw_tru = float(lie.rot_to_ypr(lie.quat_to_rot(jnp.asarray(q_t[0])))[0])
dyaw = np.deg2rad(yaw_est - yaw_tru)
c, s = np.cos(dyaw), np.sin(dyaw)
Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
qz = np.array([np.cos(dyaw / 2), 0, 0, np.sin(dyaw / 2)])
p_a = (p_t - p_t[0]) @ Rz.T + est.p[0]
q_a = np.stack([_quat_mul_np(qz, q) for q in q_t])

ric, tic = cfg.ric_tic()
lm = sim["landmarks"]
d_true = np.ones(est.F)
for n, sslot in enumerate(slots):
    sf = int(est.fm.start[sslot])
    ki = kis[sf]
    Rw = sim["R"][ki] @ ric[0]
    tw = sim["R"][ki] @ tic[0] + sim["p"][ki]
    z = (Rw.T @ (lm[int(est.fm.ids[sslot])] - tw))[2]
    d_true[n] = 1.0 / max(z, 0.1)

st_tru = est._window_state(d_true[: len(slots)])._replace(
    p=jnp.asarray(p_a), q=jnp.asarray(q_a), v=jnp.asarray(v_t @ Rz.T),
    ba=jnp.tile(jnp.asarray(sim["acc_bias"]), (11, 1)),
    bg=jnp.tile(jnp.asarray(sim["gyr_bias"]), (11, 1)),
    rho=jnp.full((11, 4), sim["rho"][0]))

r = np.asarray(fac._proj_residuals(st_tru, data))[: len(slots)]  # (n,11,4)
per_feat = 0.5 * (r ** 2).sum(axis=(1, 2))
starts = est.fm.start[slots]
obs_counts = est.fm.obs[slots].sum(axis=1)
order = np.argsort(-per_feat)
print("(b) streaming final window @ aligned truth: total proj cost",
      per_feat.sum())
print("worst 12 features: [cost, anchor_frame, n_obs, inv_depth_est, "
      "inv_depth_true]")
for n in order[:12]:
    print(f"  slot={slots[n]} cost={per_feat[n]:9.2f} start={starts[n]} "
          f"nobs={obs_counts[n]} d_est={est.fm.depth[slots[n]]:.4f} "
          f"d_tru={d_true[n]:.4f}")
# error by anchor frame
for sf in range(11):
    m = starts == sf
    if m.sum():
        print(f"anchor={sf}: n={m.sum()} cost_sum={per_feat[m].sum():10.2f}")
# per (feature,frame) rms in px, split mono/stereo
rms_mono = np.sqrt((r[:, :, 0:2] ** 2).sum() /
                   max((np.abs(r[:, :, 0:2]) > 0).sum(), 1)) * 1.5
rms_st = np.sqrt((r[:, :, 2:4] ** 2).sum() /
                 max((np.abs(r[:, :, 2:4]) > 0).sum(), 1)) * 1.5
print(f"rms mono px={rms_mono:.3f} stereo px={rms_st:.3f}")

#!/usr/bin/env python
"""Cross-check every stored observation in the feature manager against a
fresh reprojection of the TRUE landmark at the TRUE pose of that window
frame. Any mismatch >> pixel noise = bookkeeping corruption (wrong frame
association, stale data after slides, or slot recycling)."""

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
from cerberus_tpu.estimator.estimator import Estimator

cfg = EstimatorConfig()
sim = simulate(SimConfig(duration=3.0, speed=0.5, seed=5))
est = Estimator(cfg, dtype=jnp.float64)
t = sim["t"]
cam_lookup = {int(k): f for k, f in zip(sim["cam_idx"], sim["features"])}
allowed = set(sorted(cam_lookup)[:20])

check_after = 14  # check from this frame on
n_frames = 0
for k in range(len(t)):
    est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                      sim["dphi"][k], sim["contacts"][k])
    if k in allowed:
        est.input_image(t[k], cam_lookup[k])
        n_frames += 1

# ---- verify stored observations ----
ric, tic = cfg.ric_tic()
lm = sim["landmarks"]
kis = [min(int(round(h * 500)), len(t) - 1) for h in est.headers]
fm = est.fm
bad = []
tot = 0
for s in np.nonzero(fm.active)[0]:
    lid = int(fm.ids[s])
    for fi in range(11):
        if not fm.obs[s, fi]:
            continue
        ki = kis[fi]
        Rwc = sim["R"][ki] @ ric[0]
        twc = sim["R"][ki] @ tic[0] + sim["p"][ki]
        pc = Rwc.T @ (lm[lid] - twc)
        if pc[2] < 0.05:
            print(f"slot {s} lid {lid} frame {fi}: behind camera z={pc[2]:.2f}")
            continue
        pred = pc[:2] / pc[2]
        errpx = np.linalg.norm(fm.pts[s, fi, :2] - pred) * 460.0
        tot += 1
        if errpx > 3.0:
            bad.append((s, lid, fi, errpx, pc[2]))

print(f"checked {tot} observations, {len(bad)} bad (>3 px)")
for s, lid, fi, errpx, z in bad[:25]:
    print(f"  slot={s} lid={lid} frame={fi} err_px={errpx:8.2f} z_true={z:.2f} "
          f"start={fm.start[s]} obs={fm.obs[s].astype(int)}")

# also check header consistency: do est.headers match actual cam times?
print("headers:", [round(h, 3) for h in est.headers])
print("frames fed:", n_frames, "keyframes:", est.stats["keyframes"])

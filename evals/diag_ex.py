#!/usr/bin/env python
"""Does online extrinsic estimation hurt? Compare replay accuracy with
estimate_extrinsic on/off under the slip simulator, and print the extrinsic
drift from nominal."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.replay import replay
from cerberus_tpu.estimator.estimator import Estimator

DUR = float(os.environ.get("DIAG_DUR", "8.0"))
MAXF = int(os.environ.get("DIAG_FRAMES", "999"))
sim = simulate(SimConfig(duration=DUR, speed=0.5, seed=5))

for est_ex, vision in ((True, True), (False, True), (True, False)):
    cfg = EstimatorConfig(estimate_extrinsic=est_ex)
    est = Estimator(cfg, dtype=jnp.float64)
    s2 = sim
    if not vision:
        s2 = dict(sim)
        s2["features"] = [{} for _ in sim["features"]]
    print(f"--- estimate_extrinsic={est_ex} vision={vision}", flush=True)
    out = replay(s2, est=est, max_frames=MAXF)
    ric, tic = cfg.ric_tic()
    dtic = np.linalg.norm(est.tic - tic, axis=1)
    from cerberus_tpu.estimator.estimator import _quat_to_rot_np
    dang = [np.degrees(np.arccos(np.clip(
        (np.trace(_quat_to_rot_np(est.qic[i]) @ ric[i].T) - 1) / 2, -1, 1)))
        for i in range(2)]
    print(f"estimate_extrinsic={est_ex} vision={vision}: "
          f"ate={out['ate_rmse']:.5f} "
          f"drift%={out['drift_pct']:.3f} dist={out['distance']:.3f}")
    print(f"  extrinsic drift: |dt|={dtic} dang_deg={dang}")
    d = est.fm.depth[est.fm.active & (est.fm.depth > 0)]
    if len(d):
        print(f"  inv depths: med={np.median(d):.4f} min={d.min():.4f} "
              f"max={d.max():.4f} n={len(d)}")

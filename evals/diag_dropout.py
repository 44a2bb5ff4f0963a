#!/usr/bin/env python
"""Diagnose the imu_dropout_2x1s robustness failure: which failure-detection
check reboots the estimator, and how the error evolves around the dropout
windows."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

on_tpu = any(d.platform != "cpu" for d in jax.devices())
dtype = jnp.float32 if on_tpu else jnp.float64
if not on_tpu:
    jax.config.update("jax_enable_x64", True)
print("platform:", jax.devices()[0].platform, flush=True)

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.replay import replay
from cerberus_tpu.estimator.estimator import Estimator
from evals.robustness import imu_dropout

dur = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
sim = simulate(SimConfig(duration=dur, speed=0.5, path="street", seed=31))
sim = imu_dropout(sim, [(dur * 0.3, dur * 0.3 + 1.0),
                        (dur * 0.7, dur * 0.7 + 1.0)])
est = Estimator(EstimatorConfig(), dtype=dtype)
out = replay(sim, est=est)
print("drift_pct", round(out["drift_pct"], 4), "ate", round(out["ate_rmse"], 4),
      "reboots", est.stats["reboots"],
      "stale_intervals", est.stats.get("stale_imu_intervals"),
      flush=True)
print("failure_reasons:", est.stats.get("failure_reasons"), flush=True)
# per-frame error trace around the dropout windows
t = out["est_t"]
err = np.linalg.norm(out["est_p"] - out["est_p"][0]
                     - (out["gt_p"] - out["gt_p"][0]), axis=1)
for t0 in (dur * 0.3, dur * 0.7):
    sel = (t > t0 - 2) & (t < t0 + 4)
    rows = [f"{tt:.2f}:{ee:.3f}" for tt, ee in zip(t[sel][::3], err[sel][::3])]
    print(f"err around {t0:.0f}s:", " ".join(rows), flush=True)
print("final errs:", " ".join(f"{tt:.1f}:{ee:.3f}"
                              for tt, ee in zip(t[-30::5], err[-30::5])))

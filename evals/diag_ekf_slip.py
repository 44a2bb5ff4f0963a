#!/usr/bin/env python
"""EKF contact/slip model A/B: drift on the slip-realistic and no-slip
config-1 sims for combinations of the slip-innovation gate and the
force-variance inflation."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.replay import score
from cerberus_tpu.frontend import LeggedEKF

dur = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
sim_slip = simulate(SimConfig(duration=dur, speed=0.4, seed=21))
sim_clean = simulate(SimConfig(duration=dur, speed=0.4, seed=21,
                               foot_slip_sigma=0.0,
                               foot_slip_forward_bias=0.0))


def run(cfg, sim):
    ekf = LeggedEKF(cfg, filter_window=4)
    ekf.init_filter(sim["t"][0], sim["acc"][0], sim["gyr"][0], sim["phi"][0])
    ps = []
    for k in range(1, len(sim["t"])):
        ekf.update_filter(sim["t"][k], sim["acc"][k], sim["gyr"][k],
                          sim["phi"][k], dphi=sim["dphi"][k],
                          foot_force=sim["foot_forces"][k])
        ps.append(ekf.get_state()[0:3])
    ps = np.array(ps)
    gt = sim["p"][1:len(ps) + 1] - sim["p"][0]
    return score(ps[:, :2], gt[:, :2])


VARIANTS_ALL = [("gate0_var0", 0.0, 0.0), ("gate11_var0", 11.34, 0.0),
            ("gate0_var25", 0.0, 25.0), ("gate11_var25", 11.34, 25.0),
            ("gate5_var25", 5.0, 25.0), ("gate20_var100", 20.0, 100.0)]
import os as _os
variants = [v for v in VARIANTS_ALL if not _os.environ.get("EKF_VARIANTS") or v[0] in _os.environ["EKF_VARIANTS"].split(",")]
for name, gate, var in variants:
    n = dataclasses.replace(EstimatorConfig().noise,
                            ekf_slip_gate_chi2=gate,
                            ekf_force_var_rescale=var)
    cfg = dataclasses.replace(EstimatorConfig(), noise=n)
    t0 = time.time()
    m_s = run(cfg, sim_slip)
    m_c = run(cfg, sim_clean)
    print(f"{name}: slip {m_s['drift_pct']:.3f}% ate {m_s['ate_rmse']:.4f} | "
          f"clean {m_c['drift_pct']:.3f}% | {time.time()-t0:.0f}s",
          flush=True)

#!/usr/bin/env python
"""Single-window rho observability check: simulate with true calf length
0.215, preintegrate/linearize at 0.21, solve with rho free, and see whether
rho moves toward truth. Also FD-check d(deps)/d(rho) of the accumulated
preintegration Jacobian J."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pre-imports jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from cerberus_tpu import config as C
from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops.preintegration import PreintParams, il_preintegrate
from cerberus_tpu.ops.solver import SolveOptions, solve_window

TRUE_LEN = 0.215
NOM_LEN = 0.21

cfg_nom = EstimatorConfig()  # estimator thinks calf = 0.21
robot_true = dataclasses.replace(cfg_nom.robot, lower_leg_length=TRUE_LEN)
cfg_true = EstimatorConfig(robot=robot_true)

sim = simulate(SimConfig(duration=8.0, speed=0.5, seed=24), cfg_true)

# ---- part 1: FD check of accumulated J w.r.t. rho on one interval ----
params = PreintParams.from_config(cfg_nom, jnp.float64)
s, e = 0, 200
sl = slice(s, e + 1)
n = e - s + 1
dt = np.full(n, 1 / 500)
mask = np.ones(n, bool)
mask[0] = False
f = lambda x: jnp.asarray(x, jnp.float64)
ba = jnp.zeros(3)
bg = jnp.zeros(3)


def preint_at(rho_val):
    rho = jnp.full((4,), rho_val)
    return il_preintegrate(f(dt), f(sim["acc"][sl]), f(sim["gyr"][sl]),
                           f(sim["phi"][sl]), f(sim["dphi"][sl]),
                           f(sim["contacts"][sl]), jnp.asarray(mask),
                           ba, bg, rho, params)


p0 = preint_at(NOM_LEN)
eps = 1e-5
p1 = preint_at(NOM_LEN + eps)
fd = (np.asarray(p1.deps) - np.asarray(p0.deps)) / eps  # (4,3)
for j in range(4):
    r = C.ILO_EPS + 3 * j
    Jcol = np.asarray(p0.J[r:r + 3, C.ILO_RHO + j])
    print(f"leg {j}: J d(eps)/d(rho) = {Jcol}, FD = {fd[j]}")

# true displacement vs predicted at both rho values
print("deps@0.21 :", np.asarray(p0.deps))
print("deps@0.215:", np.asarray(preint_at(TRUE_LEN).deps))
ktrue = sim["p"][e] - sim["p"][s]
R0 = sim["R"][s]
print("truth     :", R0.T @ ktrue)

# ---- part 2: single window solve with rho free, init 0.21 ----
data, truth, Fa = build_window_from_sim(sim, cfg_nom, kf_stride=3,
                                        start_cam=6, dtype=jnp.float64)
# truth state has rho = nominal (0.21 per window_builder using cfg_nom);
# fix: truth rho should be TRUE_LEN
truth = truth._replace(rho=jnp.full((11, 4), TRUE_LEN))

rng = np.random.default_rng(0)
init = truth._replace(
    rho=jnp.full((11, 4), NOM_LEN),
    p=truth.p + jnp.asarray(rng.normal(size=(11, 3)) * 0.01),
    v=truth.v + jnp.asarray(rng.normal(size=(11, 3)) * 0.02),
    ba=jnp.zeros_like(truth.ba), bg=jnp.zeros_like(truth.bg),
)
st, info = solve_window(init, data, SolveOptions(max_iters=30))
print("cost0 -> cost:", float(info.cost0), float(info.cost),
      "accepted", int(info.accepted))
print("rho solved (frame 5):", np.asarray(st.rho[5]))
print("rho err mm:", (np.asarray(st.rho[5]) - TRUE_LEN) * 1000)
print("pos err:", np.linalg.norm(np.asarray(st.p) - np.asarray(truth.p), axis=1))

"""Fleet-scale batched VILO: many windows solved per step.

BASELINE.json config 5 ('Pod-scale batched VILO: thousands of perturbed
windows'): build a batch of window problems from trajectory segments and
Monte-Carlo perturbations (initial-state noise, calibration perturbations),
shard them over the device mesh, and solve them all in one pjit step. Used
for throughput benchmarking, covariance studies (empirical estimator
uncertainty), and calibration sensitivity sweeps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data.simulator import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops.solver import SolveOptions, solve_window
from cerberus_tpu.parallel.mesh import make_mesh, shard_batch
from cerberus_tpu.utils import lie


class FleetResult(NamedTuple):
    states: fac.WindowState       # (B, ...) solved
    cost0: jax.Array              # (B,)
    cost: jax.Array               # (B,)
    traj_err: jax.Array           # (B,) max aligned trajectory error vs truth


def build_fleet(n_segments: int = 4, n_perturb: int = 8, seed: int = 0,
                cfg: EstimatorConfig | None = None, F: int = 96,
                dtype=jnp.float32, sim_duration: float = 12.0,
                p_sigma: float = 0.03, v_sigma: float = 0.05,
                rho_sigma: float = 0.003):
    """Build B = n_segments * n_perturb window problems.

    Segments come from different stretches of simulated trajectories (varied
    seeds/paths); each segment is replicated with Monte-Carlo initial-state
    and calibration perturbations."""
    cfg = cfg or EstimatorConfig()
    rng = np.random.default_rng(seed)
    datas, truths = [], []
    paths = ["arc", "line", "figure8"]
    for s in range(n_segments):
        sim = simulate(SimConfig(duration=sim_duration, speed=0.4 + 0.1 * (s % 3),
                                 seed=seed + s, path=paths[s % 3],
                                 n_landmarks=350))
        start = 2 + 3 * (s % 3)
        data, truth, _ = build_window_from_sim(sim, cfg, kf_stride=2,
                                               start_cam=start, F=F,
                                               dtype=dtype)
        datas.append(data)
        truths.append(truth)

    def perturb(t: fac.WindowState):
        return t._replace(
            p=t.p + jnp.asarray(rng.normal(size=(11, 3)) * p_sigma, dtype),
            v=t.v + jnp.asarray(rng.normal(size=(11, 3)) * v_sigma, dtype),
            rho=t.rho + jnp.asarray(rng.normal(size=(11, 4)) * rho_sigma, dtype),
            ba=jnp.zeros_like(t.ba), bg=jnp.zeros_like(t.bg),
        )

    all_states, all_datas, all_truths = [], [], []
    for d, t in zip(datas, truths):
        for _ in range(n_perturb):
            all_states.append(perturb(t))
            all_datas.append(d)
            all_truths.append(t)
    stack = lambda xs: jax.tree.map(lambda *ls: jnp.stack(ls), *xs)
    return stack(all_states), stack(all_datas), stack(all_truths)


def _traj_err(st: fac.WindowState, truth: fac.WindowState):
    R0 = lie.quat_to_rot(st.q[0])
    R0t = lie.quat_to_rot(truth.q[0])
    rel = jnp.einsum("ij,nj->ni", R0.T, st.p - st.p[0])
    rel_t = jnp.einsum("ij,nj->ni", R0t.T, truth.p - truth.p[0])
    return jnp.max(jnp.linalg.norm(rel - rel_t, axis=-1))


def solve_fleet(states, datas, truths, mesh=None,
                opts: SolveOptions = SolveOptions(max_iters=12)) -> FleetResult:
    """One sharded fleet step: solve every window, score against truth."""

    def one(s, d, t):
        st, info = solve_window(s, d, opts)
        return st, info.cost0, info.cost, _traj_err(st, t)

    fn = jax.jit(jax.vmap(one))
    if mesh is not None:
        states = shard_batch(states, mesh)
        datas = shard_batch(datas, mesh)
        truths = shard_batch(truths, mesh)
    st, c0, c, err = fn(states, datas, truths)
    return FleetResult(states=st, cost0=c0, cost=c, traj_err=err)

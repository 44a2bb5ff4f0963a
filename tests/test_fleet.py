"""Fleet-scale batched solving tests (virtual 8-device mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.ops.solver import SolveOptions
from cerberus_tpu.parallel.fleet import build_fleet, solve_fleet
from cerberus_tpu.parallel.mesh import make_mesh


@pytest.mark.slow
def test_fleet_solves_and_converges():
    states, datas, truths = build_fleet(n_segments=2, n_perturb=4, F=48,
                                        dtype=jnp.float64, sim_duration=8.0)
    mesh = make_mesh(8)
    res = solve_fleet(states, datas, truths, mesh,
                      SolveOptions(max_iters=8))
    assert res.states.p.shape[0] == 8
    assert bool(jnp.all(jnp.isfinite(res.cost)))
    # every window's cost decreased and trajectory recovered
    assert bool(jnp.all(res.cost < res.cost0))
    assert float(jnp.median(res.traj_err)) < 0.02, np.asarray(res.traj_err)

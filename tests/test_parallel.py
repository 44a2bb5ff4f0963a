"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops.solver import SolveOptions
from cerberus_tpu.parallel import (
    batched_solve, make_mesh, pooled_calibration_step, shard_batch)


@pytest.fixture(scope="module")
def problem():
    sim = simulate(SimConfig(duration=5.0, speed=0.5, seed=3,
                             n_landmarks=200))
    return build_window_from_sim(sim, EstimatorConfig(), kf_stride=2,
                                 start_cam=2, F=48)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_batched_solve_sharded_matches_single(problem):
    data, truth, Fa = problem
    mesh = make_mesh(8)
    B = 8
    rng = np.random.default_rng(0)
    perts = [truth._replace(
        p=truth.p + jnp.asarray(rng.normal(size=(11, 3)) * 0.02))
        for _ in range(B)]
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *perts)
    datas = jax.tree.map(lambda x: jnp.stack([x] * B), data)
    states = shard_batch(states, mesh)
    datas = shard_batch(datas, mesh)
    sts, infos = batched_solve(states, datas, mesh,
                               SolveOptions(max_iters=3))
    assert sts.p.shape == (B, 11, 3)
    assert bool(jnp.all(jnp.isfinite(infos.cost)))
    assert bool(jnp.all(infos.cost <= infos.cost0))
    # lane 0 must equal an unsharded solve of the same problem
    st0, info0 = batched_solve(
        jax.tree.map(lambda x: x[:1], states),
        jax.tree.map(lambda x: x[:1], datas), None, SolveOptions(max_iters=3))
    np.testing.assert_allclose(np.asarray(sts.p[0]), np.asarray(st0.p[0]),
                               atol=1e-8)


@pytest.mark.slow
def test_pooled_calibration_sharded_matches_local(problem):
    """The psum-reduced shared-rho normal equations must equal the local
    (unsharded) reduction, and the pooled step must move rho toward truth
    when every window starts with the same rho offset."""
    data, truth, Fa = problem
    mesh = make_mesh(8)
    B = 8
    rng = np.random.default_rng(1)
    # windows otherwise converged (the intended usage: run the pooled step
    # AFTER batched_solve), sharing a common 4 mm calibration offset
    perts = [truth._replace(rho=truth.rho + 0.004) for _ in range(B)]
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *perts)
    datas = jax.tree.map(lambda x: jnp.stack([x] * B), data)
    new_local, dx_local, H_l, b_l = pooled_calibration_step(states, datas)
    states_sh = shard_batch(states, mesh)
    datas_sh = shard_batch(datas, mesh)
    new_sh, dx_sh, H_s, b_s = pooled_calibration_step(states_sh, datas_sh,
                                                      mesh)
    np.testing.assert_allclose(np.asarray(H_s), np.asarray(H_l),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dx_sh), np.asarray(dx_local),
                               rtol=1e-6, atol=1e-10)
    # the shared step reduces the rho offset
    err0 = float(jnp.mean(jnp.abs(states.rho - truth.rho[None])))
    err1 = float(jnp.mean(jnp.abs(new_sh.rho - truth.rho[None])))
    assert err1 < err0

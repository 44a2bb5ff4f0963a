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
    batched_solve, distributed_normal_equations, make_mesh, shard_batch)


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
def test_distributed_normal_equations_matches_local(problem):
    data, truth, Fa = problem
    mesh = make_mesh(8)
    H, b = distributed_normal_equations(truth, data, mesh)
    r, J, _ = fac.linearize(truth, data)
    np.testing.assert_allclose(np.asarray(H), np.asarray(J.T @ J),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(b), np.asarray(J.T @ r),
                               rtol=1e-9, atol=1e-9)

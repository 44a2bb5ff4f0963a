"""Lane-batched Cholesky kernel + batched LM path.

The Pallas kernel runs in interpret mode on the CPU backend (numerics
identical to TPU compilation up to op ordering); the batched LM path is
pinned against vmap(solve_window), the production single-window solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.ops.lane_cholesky import (LANES, lane_cholesky_solve,
                                            lane_cholesky_solve_ref)


def _spd(rng, B, n, dtype=np.float32):
    J = rng.normal(size=(B, n + 5, n)).astype(dtype)
    A = np.einsum("bij,bik->bjk", J, J) + 0.5 * np.eye(n, dtype=dtype)
    b = rng.normal(size=(B, n)).astype(dtype)
    return jnp.asarray(A), jnp.asarray(b)


@pytest.mark.parametrize("n", [16, 37, 222])
def test_kernel_matches_xla(rng, n):
    A, b = _spd(rng, LANES, n)
    x = lane_cholesky_solve(A, b, interpret=True)
    xr = lane_cholesky_solve_ref(A, b)
    err = float(jnp.max(jnp.abs(x - xr)) / jnp.max(jnp.abs(xr)))
    assert err < 2e-3, err


def test_kernel_multi_chunk(rng):
    """Grid covers B > LANES (two lane chunks)."""
    A, b = _spd(rng, 2 * LANES, 24)
    x = lane_cholesky_solve(A, b, interpret=True)
    xr = lane_cholesky_solve_ref(A, b)
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-3


def test_batched_solve_matches_vmap(rng):
    """solve_window_batched (XLA solve path) == vmap(solve_window) on the
    production window problem, f64."""
    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.window_builder import build_window_from_sim
    from cerberus_tpu.ops.solver import (SolveOptions, solve_window,
                                         solve_window_batched)

    cfg = EstimatorConfig(dtype="float64")
    sim = simulate(SimConfig(duration=6.0, speed=0.5, seed=3))
    data, truth, _ = build_window_from_sim(sim, cfg, dtype=jnp.float64)
    B = 4

    def perturb(i):
        r = np.random.default_rng(i)
        return truth._replace(
            p=truth.p + jnp.asarray(r.normal(size=(11, 3)) * 0.02,
                                    jnp.float64),
            v=truth.v + jnp.asarray(r.normal(size=(11, 3)) * 0.04,
                                    jnp.float64))

    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[perturb(i) for i in range(B)])
    datas = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                         data)
    opts = SolveOptions(max_iters=6)
    st_v, info_v = jax.jit(jax.vmap(
        lambda s, d: solve_window(s, d, opts)))(states, datas)
    st_b, info_b = jax.jit(
        lambda s, d: solve_window_batched(s, d, opts, lane_chol=False))(
        states, datas)
    np.testing.assert_allclose(np.asarray(info_b.cost),
                               np.asarray(info_v.cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(st_b.p), np.asarray(st_v.p),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_b.ba), np.asarray(st_v.ba),
                               atol=1e-9)


def test_batched_solve_lane_kernel_agrees(rng):
    """The Pallas lane path (interpret) == the XLA path inside the batched
    LM, f32 single iteration scale."""
    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.window_builder import build_window_from_sim
    from cerberus_tpu.ops import lane_cholesky as lc
    from cerberus_tpu.ops.solver import SolveOptions, solve_window_batched

    cfg = EstimatorConfig(dtype="float32")
    sim = simulate(SimConfig(duration=6.0, speed=0.5, seed=3))
    data, truth, _ = build_window_from_sim(sim, cfg, dtype=jnp.float32)
    B = lc.LANES

    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), truth)
    states = states._replace(
        p=states.p + jnp.asarray(
            np.random.default_rng(0).normal(size=(B, 11, 3)) * 0.02,
            jnp.float32))
    datas = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                         data)
    opts = SolveOptions(max_iters=2)
    import unittest.mock as mock
    orig = lc.lane_cholesky_solve
    with mock.patch.object(lc, "lane_cholesky_solve",
                           lambda A, b: orig(A, b, interpret=True)):
        st_l, info_l = solve_window_batched(states, datas, opts,
                                            lane_chol=True)
    st_x, info_x = solve_window_batched(states, datas, opts,
                                        lane_chol=False)
    np.testing.assert_allclose(np.asarray(info_l.cost),
                               np.asarray(info_x.cost), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st_l.p), np.asarray(st_x.p),
                               rtol=1e-3, atol=1e-5)

"""Structured normal-equation assembly must match the dense jacfwd path."""

import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops.solver import SolveOptions, solve_window
from cerberus_tpu.ops.structured import build_normal_equations


@pytest.fixture(scope="module")
def problem():
    sim = simulate(SimConfig(duration=5.0, speed=0.5, seed=3, n_landmarks=150))
    return build_window_from_sim(sim, EstimatorConfig(), kf_stride=2,
                                 start_cam=2, F=40)


def test_H_b_match_dense(problem):
    data, truth, Fa = problem
    H, b, r0 = build_normal_equations(truth, data)
    r, J, r0_dense = fac.linearize(truth, data)
    H_d = np.asarray(J.T @ J)
    b_d = np.asarray(J.T @ r)
    scale = max(1.0, np.abs(H_d).max())
    np.testing.assert_allclose(np.asarray(H), H_d, atol=1e-7 * scale)
    np.testing.assert_allclose(np.asarray(b), b_d,
                               atol=1e-8 * max(1.0, np.abs(b_d).max()))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r0_dense), atol=1e-10)


def test_H_b_match_dense_with_prior_and_perturbation(problem):
    data, truth, Fa = problem
    from cerberus_tpu.ops import marginalize as marg
    pj, pr, _ = marg.marginalize_old(truth, data)
    data2 = data._replace(prior_J=pj, prior_r=pr,
                          prior_valid=jnp.asarray(True), prior_lin=truth)
    rng = np.random.default_rng(0)
    st = truth._replace(p=truth.p + jnp.asarray(rng.normal(size=(11, 3)) * 0.02))
    H, b, r0 = build_normal_equations(st, data2)
    r, J, _ = fac.linearize(st, data2)
    H_d = np.asarray(J.T @ J)
    b_d = np.asarray(J.T @ r)
    np.testing.assert_allclose(np.asarray(H), H_d,
                               atol=1e-7 * max(1.0, np.abs(H_d).max()))
    np.testing.assert_allclose(np.asarray(b), b_d,
                               atol=1e-8 * max(1.0, np.abs(b_d).max()))


def test_structured_solver_matches_dense(problem):
    data, truth, Fa = problem
    rng = np.random.default_rng(1)
    init = truth._replace(
        p=truth.p + jnp.asarray(rng.normal(size=(11, 3)) * 0.03),
        ba=jnp.zeros_like(truth.ba), bg=jnp.zeros_like(truth.bg))
    st_s, info_s = solve_window(init, data, SolveOptions(max_iters=6,
                                                         structured=True))
    st_d, info_d = solve_window(init, data, SolveOptions(max_iters=6,
                                                         structured=False))
    np.testing.assert_allclose(np.asarray(st_s.p), np.asarray(st_d.p),
                               atol=1e-6)
    np.testing.assert_allclose(float(info_s.cost), float(info_d.cost),
                               rtol=1e-6)


def test_linearize_rows_matches_dense(problem):
    """linearize_rows (factor-sparse J assembly, used by marginalization)
    must reproduce factors.linearize's weighted (r, J) exactly."""
    from cerberus_tpu.ops.structured import linearize_rows

    data, truth, Fa = problem
    rng = np.random.default_rng(3)
    st = truth._replace(
        p=truth.p + jnp.asarray(rng.normal(size=(11, 3)) * 0.02))
    r_s, J_s = linearize_rows(st, data)
    r_d, J_d, _ = fac.linearize(st, data)
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_d), atol=1e-9)
    scale = max(1.0, float(np.abs(np.asarray(J_d)).max()))
    np.testing.assert_allclose(np.asarray(J_s), np.asarray(J_d),
                               atol=1e-8 * scale)

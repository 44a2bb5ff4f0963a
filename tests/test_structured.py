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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_schur_solve_matches_dense_damped_solve(problem):
    """Closed-form depth elimination must reproduce the full damped solve
    exactly (the depth-depth block is diagonal by construction)."""
    import jax.numpy as jnp
    from cerberus_tpu.ops.solver import (_damped_solve, _damped_solve_schur,
                                         _project_gauge_blocks)
    from cerberus_tpu.ops.structured import build_normal_equations_blocks

    data, truth, Fa = problem
    rng = np.random.default_rng(2)
    st = truth._replace(p=truth.p + jnp.asarray(rng.normal(size=(11, 3)) * 0.02))
    H, b, _ = build_normal_equations(st, data)
    Hpp, Hpd, hdd, bp, bd, _ = build_normal_equations_blocks(st, data)
    D = fac.D_DENSE
    # block view assembles the same H
    np.testing.assert_allclose(np.asarray(H[:D, :D]), np.asarray(Hpp),
                               atol=1e-9 * max(1.0, float(np.abs(Hpp).max())))
    np.testing.assert_allclose(np.asarray(H[:D, D:]), np.asarray(Hpd),
                               atol=1e-9 * max(1.0, float(np.abs(Hpd).max())))
    assert np.allclose(np.asarray(jnp.diag(H)[D:]), np.asarray(hdd))
    # depth off-diagonal block is exactly zero
    Hd = np.asarray(H[D:, D:])
    assert np.abs(Hd - np.diag(np.diag(Hd))).max() == 0.0

    opts = SolveOptions()
    for lam in (1e-4, 1e-1, 1e2):
        lam = jnp.asarray(lam, H.dtype)
        dx_dense = np.asarray(_damped_solve(H, b, lam, opts))
        dx_schur = np.asarray(
            _damped_solve_schur(Hpp, Hpd, hdd, bp, bd, lam, opts))
        np.testing.assert_allclose(dx_schur, dx_dense,
                                   atol=1e-9 * max(1.0, np.abs(dx_dense).max()))


@pytest.mark.slow
def test_schur_gauge_projection_matches_full(problem):
    """Rank-4 gauge projection on the blocks == dense P H P on the full
    system (gauge basis has no depth support)."""
    import jax.numpy as jnp
    from cerberus_tpu.ops.marginalize import _gauge_null_basis
    from cerberus_tpu.ops.solver import (_damped_solve, _damped_solve_schur,
                                         _project_gauge_blocks)
    from cerberus_tpu.ops.structured import build_normal_equations_blocks

    data, truth, Fa = problem
    st = truth
    H, b, _ = build_normal_equations(st, data)
    Hpp, Hpd, hdd, bp, bd, _ = build_normal_equations_blocks(st, data)

    dim = H.shape[0]
    N = _gauge_null_basis(st, dim)
    freec = jnp.concatenate([data.free_mask, data.f_valid]).astype(H.dtype)
    N = N * freec[:, None]
    G = N.T @ N + 1e-10 * jnp.eye(4, dtype=H.dtype)
    P = jnp.eye(dim, dtype=H.dtype) - N @ jnp.linalg.solve(G, N.T)
    Hf, bf = P @ H @ P, P @ b

    Hpp2, Hpd2, bp2 = _project_gauge_blocks(Hpp, Hpd, bp, st, data.free_mask)
    lam = jnp.asarray(1e-3, H.dtype)
    opts = SolveOptions()
    dx1 = np.asarray(_damped_solve(Hf, bf, lam, opts))
    dx2 = np.asarray(_damped_solve_schur(Hpp2, Hpd2, hdd, bp2, bd, lam, opts))
    np.testing.assert_allclose(dx2, dx1,
                               atol=1e-8 * max(1.0, np.abs(dx1).max()))


@pytest.mark.slow
def test_schur_full_solve_matches_nonschur(problem):
    data, truth, Fa = problem
    rng = np.random.default_rng(3)
    init = truth._replace(
        p=truth.p + jnp.asarray(rng.normal(size=(11, 3)) * 0.03),
        ba=jnp.zeros_like(truth.ba), bg=jnp.zeros_like(truth.bg))
    s1, i1 = solve_window(init, data, SolveOptions(max_iters=6, schur=False))
    s2, i2 = solve_window(init, data, SolveOptions(max_iters=6, schur=True))
    np.testing.assert_allclose(np.asarray(s2.p), np.asarray(s1.p), atol=1e-8)
    np.testing.assert_allclose(float(i2.cost), float(i1.cost), rtol=1e-9)

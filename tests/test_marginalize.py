"""Marginalization tests: the eigen-sqrt prior must exactly reproduce the
Schur complement of the dropped block (reference semantics:
marginalization_factor.cpp:281-305)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu import config as C
from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops import marginalize as marg


@pytest.fixture(scope="module")
def problem():
    sim = simulate(SimConfig(duration=5.0, speed=0.5, seed=3, n_landmarks=150))
    return build_window_from_sim(sim, EstimatorConfig(), kf_stride=2,
                                 start_cam=2, F=32)


def numpy_schur(H, b, drop):
    keep = ~drop
    Hdd = H[np.ix_(drop, drop)]
    Hkd = H[np.ix_(keep, drop)]
    Hkk = H[np.ix_(keep, keep)]
    lam, V = np.linalg.eigh(Hdd)
    inv = V @ np.diag(np.where(lam > 1e-8, 1 / np.maximum(lam, 1e-8), 0)) @ V.T
    Hs = Hkk - Hkd @ inv @ Hkd.T
    bs = b[keep] - Hkd @ inv @ b[drop]
    return Hs, bs


def numpy_gauge_project(H, b, state, keep_dense):
    """Independent NumPy version of the analytic gauge-null-space projection
    (global translation x3 + yaw) applied by ops/marginalize before the
    eigen square root. Operates on the keep_dense-restricted dense block."""
    from scipy.spatial.transform import Rotation

    dim = fac.D_DENSE
    N = np.zeros((dim, 4))
    z = np.array([0.0, 0.0, 1.0])
    p = np.asarray(state.p)
    v = np.asarray(state.v)
    q = np.asarray(state.q)
    for i in range(C.NUM_FRAMES):
        po = fac.POSE_OFF + 6 * i
        so = fac.SB_OFF + 9 * i
        for d in range(3):
            N[po + d, d] = 1.0
        N[po: po + 3, 3] = np.cross(z, p[i])
        R = Rotation.from_quat(np.roll(q[i], -1)).as_matrix()
        N[po + 3: po + 6, 3] = R.T @ z
        N[so: so + 3, 3] = np.cross(z, v[i])
    Nk = N[keep_dense]
    P = np.eye(keep_dense.sum()) - Nk @ np.linalg.solve(
        Nk.T @ Nk + 1e-12 * np.eye(4), Nk.T)
    return P @ H @ P, P @ b


@pytest.mark.slow
def test_marginalize_old_matches_numpy_schur(problem):
    data, truth, Fa = problem
    F = truth.depth.shape[0]
    pj, pr, valid = marg.marginalize_old(truth, data)
    assert bool(valid)

    # independent numpy computation of the same sub-problem
    anchored0 = np.asarray(data.f_start == 0) & np.asarray(data.f_valid)
    sub = data._replace(
        interval_valid=data.interval_valid & (jnp.arange(10) == 0),
        f_valid=data.f_valid & (data.f_start == 0))
    r, J, _ = fac.linearize(truth, sub)
    H = np.asarray(J.T @ J)
    b = np.asarray(J.T @ r)
    drop = np.zeros(fac.tangent_dim(F), bool)
    drop[fac.frame_tangent_indices(0)] = True
    drop[fac.D_DENSE:] = anchored0
    Hs, bs = numpy_schur(H, b, drop)

    # keep dims inside the dense block (depths were all dropped)
    keep_dense = np.ones(fac.D_DENSE, bool)
    keep_dense[fac.frame_tangent_indices(0)] = False
    # gauge-null-space projection (matches ops/marginalize)
    kd = keep_dense.sum()
    Hs_d, bs_d = numpy_gauge_project(Hs[:kd, :kd], bs[:kd], truth, keep_dense)
    Hs[:kd, :kd] = Hs_d
    bs[:kd] = bs_d
    # prior (before shift) reconstructs the Schur information:
    # undo the frame shift by applying the inverse permutation
    P = np.asarray(marg.shift_permutation())
    Jd = np.asarray(pj) @ P.T          # unshift: new-labels -> old-labels
    Hp = Jd.T @ Jd
    bp = Jd.T @ np.asarray(pr)
    got_H = Hp[np.ix_(keep_dense, keep_dense)]
    want_H = Hs[: keep_dense.sum(), : keep_dense.sum()]
    np.testing.assert_allclose(got_H, want_H, atol=1e-4 * max(1, np.abs(want_H).max()))
    np.testing.assert_allclose(bp[keep_dense], bs[: keep_dense.sum()],
                               atol=1e-6 * max(1, np.abs(bs).max()))


def test_second_new_prior_reanchors(problem):
    """After MARGIN_SECOND_NEW the prior must evaluate consistently at its
    new linearization point."""
    data, truth, Fa = problem
    pj0, pr0, _ = marg.marginalize_old(truth, data)
    lin = truth  # pretend current state is the lin point
    data2 = data._replace(prior_J=pj0, prior_r=pr0,
                          prior_valid=jnp.asarray(True),
                          prior_lin=lin)
    pj, pr, valid = marg.marginalize_second_new(truth, data2)
    # evaluated at its own anchor the residual is just pr (finite, bounded)
    assert np.isfinite(np.asarray(pr)).all()
    assert np.isfinite(np.asarray(pj)).all()
    # after shifting, the new frame-10 columns must be empty
    cols = np.asarray(pj)[:, fac.frame_tangent_indices(C.WINDOW_SIZE)]
    np.testing.assert_allclose(cols, 0, atol=1e-12)

"""Leg-kinematics tests.

The reference validates its symbolic FK derivatives by finite differences
(ceres_test.cpp:15-72, commented out); here those checks are automated, plus
structural identities that pin our geometric derivation to the reference's
generated expressions (A1Kinematics.cpp:43-221).
"""

import jax.numpy as jnp
import numpy as np

from cerberus_tpu.config import A1
from cerberus_tpu.kinematics import (
    all_legs_fk_jac, leg_dfk_drho, leg_dJ_dq, leg_dJ_drho, leg_fk, leg_jac,
)


def reference_fk(q, lc, rho_fix):
    """The reference's generated FK expressions (A1Kinematics.cpp:43-67),
    transcribed as the *specification* to pin our geometric derivation."""
    ox, oy, d, lu = rho_fix
    q0, q1, q2 = q
    out = np.empty(3)
    out[0] = (ox - lu * np.sin(q1)) - lc * np.sin(q1 + q2)
    out[1] = (
        oy + d * np.cos(q0) + lu * np.cos(q1) * np.sin(q0)
        + lc * np.cos(q1) * np.cos(q2) * np.sin(q0)
        - lc * np.sin(q0) * np.sin(q1) * np.sin(q2)
    )
    out[2] = (
        d * np.sin(q0) - lu * np.cos(q0) * np.cos(q1)
        - lc * np.cos(q0) * np.cos(q1) * np.cos(q2)
        + lc * np.cos(q0) * np.sin(q1) * np.sin(q2)
    )
    return out


def sample_inputs(rng, leg=0):
    q = rng.uniform(-1.2, 1.2, size=3)
    rho = np.array([0.21 + rng.uniform(-0.03, 0.03)])
    rho_fix = A1.rho_fix()[leg]
    return jnp.array(q), jnp.array(rho), jnp.array(rho_fix)


def test_fk_matches_reference_spec(rng):
    for leg in range(4):
        for _ in range(20):
            q, rho, rho_fix = sample_inputs(rng, leg)
            got = np.asarray(leg_fk(q, rho, rho_fix))
            want = reference_fk(np.asarray(q), float(rho[0]), np.asarray(rho_fix))
            np.testing.assert_allclose(got, want, atol=1e-12)


def test_jac_finite_difference(rng):
    q, rho, rho_fix = sample_inputs(rng)
    J = np.asarray(leg_jac(q, rho, rho_fix))
    eps = 1e-7
    for k in range(3):
        dq = np.zeros(3)
        dq[k] = eps
        fd = (np.asarray(leg_fk(q + dq, rho, rho_fix)) - np.asarray(leg_fk(q - dq, rho, rho_fix))) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-6)


def test_dfk_drho_finite_difference(rng):
    q, rho, rho_fix = sample_inputs(rng)
    D = np.asarray(leg_dfk_drho(q, rho, rho_fix))
    eps = 1e-7
    fd = (np.asarray(leg_fk(q, rho + eps, rho_fix)) - np.asarray(leg_fk(q, rho - eps, rho_fix))) / (2 * eps)
    np.testing.assert_allclose(D[:, 0], fd, atol=1e-6)


def test_dJ_dq_finite_difference(rng):
    q, rho, rho_fix = sample_inputs(rng)
    D = np.asarray(leg_dJ_dq(q, rho, rho_fix))  # (9, 3); rows = column-major J
    eps = 1e-6
    for k in range(3):
        dq = np.zeros(3)
        dq[k] = eps
        Jp = np.asarray(leg_jac(q + dq, rho, rho_fix))
        Jm = np.asarray(leg_jac(q - dq, rho, rho_fix))
        fd = ((Jp - Jm) / (2 * eps)).T.reshape(-1)  # column-major flatten
        np.testing.assert_allclose(D[:, k], fd, atol=1e-5)


def test_dJ_drho_finite_difference(rng):
    q, rho, rho_fix = sample_inputs(rng)
    D = np.asarray(leg_dJ_drho(q, rho, rho_fix))
    eps = 1e-6
    Jp = np.asarray(leg_jac(q, rho + eps, rho_fix))
    Jm = np.asarray(leg_jac(q, rho - eps, rho_fix))
    fd = ((Jp - Jm) / (2 * eps)).T.reshape(-1)
    np.testing.assert_allclose(D[:, 0], fd, atol=1e-5)


def test_kron_identity(rng):
    """The reference contracts dJ_dq with a 3x9 'kron' of dphi
    (imu_leg_integration_base.cpp:266-286). Our layout must satisfy
    kron(dphi) @ dJ_dq == d(J @ dphi)/dq."""
    q, rho, rho_fix = sample_inputs(rng)
    dphi = rng.normal(size=3)
    D = np.asarray(leg_dJ_dq(q, rho, rho_fix))  # (9, 3)
    kron = np.zeros((3, 9))
    for k in range(3):
        kron[:, 3 * k : 3 * k + 3] = np.eye(3) * dphi[k]
    got = kron @ D
    eps = 1e-6
    fd = np.zeros((3, 3))
    for k in range(3):
        dq = np.zeros(3)
        dq[k] = eps
        fd[:, k] = (
            np.asarray(leg_jac(q + dq, rho, rho_fix)) @ dphi
            - np.asarray(leg_jac(q - dq, rho, rho_fix)) @ dphi
        ) / (2 * eps)
    np.testing.assert_allclose(got, fd, atol=1e-5)


def test_all_legs_batched(rng):
    phi = jnp.array(rng.uniform(-1, 1, size=(7, 4, 3)))
    rho = jnp.full((7, 4, 1), 0.21)
    rho_fix = jnp.array(A1.rho_fix())
    out = all_legs_fk_jac(phi, rho, rho_fix)
    assert out["fk"].shape == (7, 4, 3)
    assert out["J"].shape == (7, 4, 3, 3)
    assert out["dJ_dq"].shape == (7, 4, 9, 3)
    # spot check one entry against single-leg call
    np.testing.assert_allclose(
        np.asarray(out["fk"][3, 2]),
        np.asarray(leg_fk(phi[3, 2], rho[3, 2], rho_fix[2])),
        atol=1e-12,
    )

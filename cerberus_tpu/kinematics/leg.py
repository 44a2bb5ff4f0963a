"""Closed-form quadruped leg kinematics and derivatives.

Capability-equivalent of the reference's MATLAB-generated A1Kinematics
(reference: src/legKinematics/A1Kinematics.{h,cpp}), but *derived
geometrically* and differentiated with JAX AD instead of symbolic codegen.

Kinematic chain of one leg (3 DoF), foot position in the robot body frame:

    q = (q0, q1, q2) = (hip roll about +x, hip pitch about +y, knee pitch about +y)
    rho_opt = (lc,)  — calf (lower-leg) length, the online-calibrated parameter
    rho_fix = (ox, oy, d, lu) — body offsets x/y, hip motor offset, thigh length

    p_bf(q) = [ox, oy, 0] + Rx(q0) @ ( [0, d, 0] + [-lu*sin(q1), 0, -lu*cos(q1)]
                                        + [-lc*sin(q1+q2), 0, -lc*cos(q1+q2)] )

i.e. the thigh hangs below the hip pitch axis and the calf below the knee;
the hip roll rotates the whole sagittal-plane mechanism about x. This
reproduces the reference's generated expressions (A1Kinematics.cpp:43-67)
exactly — verified against finite differences and the structural identities
in tests/test_kinematics.py.

All derivative functions (jac = d fk/dq, dfk_drho, dJ_dq, dJ_drho) are exact
jacfwd transforms of `leg_fk` — the reference validates its symbolic versions
against finite differences (ceres_test.cpp:15-72); here AD *is* the ground
truth and the closed form is tested against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leg_fk(q, rho_opt, rho_fix):
    """Foot position in body frame. q: (..., 3), rho_opt: (..., 1), rho_fix: (..., 4)."""
    ox, oy, d, lu = rho_fix[..., 0], rho_fix[..., 1], rho_fix[..., 2], rho_fix[..., 3]
    lc = rho_opt[..., 0]
    q0, q1, q2 = q[..., 0], q[..., 1], q[..., 2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s12, c12 = jnp.sin(q1 + q2), jnp.cos(q1 + q2)
    s0, c0 = jnp.sin(q0), jnp.cos(q0)
    # sagittal-plane foot position relative to hip pitch axis (pre hip-roll)
    px = -lu * s1 - lc * s12
    pz = -(lu * c1 + lc * c12)
    # apply hip roll Rx(q0) to (px, d, pz): x invariant
    return jnp.stack(
        [
            ox + px,
            oy + d * c0 - pz * s0,
            d * s0 + pz * c0,
        ],
        axis=-1,
    )


# Exact derivatives via forward-mode AD (all 3-dim in/out => trivially cheap,
# fully fused by XLA).
leg_jac = jax.jacfwd(leg_fk, argnums=0)          # (3, 3) d fk / d q
leg_dfk_drho = jax.jacfwd(leg_fk, argnums=1)     # (3, 1) d fk / d rho_opt


def _jac_flat(q, rho_opt, rho_fix):
    # column-major flatten to match the reference's 9-vector layout
    # (Eigen default storage, A1Kinematics.cpp:69-107): element k = J[k%3, k//3]
    return leg_jac(q, rho_opt, rho_fix).T.reshape(-1)


def leg_dJ_dq(q, rho_opt, rho_fix):
    """(9, 3) derivative of column-major-flattened jacobian wrt q."""
    return jax.jacfwd(_jac_flat, argnums=0)(q, rho_opt, rho_fix)


def leg_dJ_drho(q, rho_opt, rho_fix):
    """(9, 1) derivative of column-major-flattened jacobian wrt rho_opt."""
    return jax.jacfwd(_jac_flat, argnums=1)(q, rho_opt, rho_fix)


def all_legs_fk_jac(phi, rho, rho_fix):
    """Vectorized FK bundle over legs (and any leading batch dims).

    Args:
      phi: (..., NUM_OF_LEG, 3) joint angles.
      rho: (..., NUM_OF_LEG, RHO_OPT_SIZE) optimized params.
      rho_fix: (NUM_OF_LEG, RHO_FIX_SIZE) or broadcastable.

    Returns dict with fk (...,L,3), J (...,L,3,3), dfk_drho (...,L,3,R),
    dJ_dq (...,L,9,3), dJ_drho (...,L,9,R).
    """
    fk = leg_fk(phi, rho, rho_fix)
    jac_v = jnp.vectorize(leg_jac, signature="(k),(r),(f)->(3,3)")
    dfk_v = jnp.vectorize(leg_dfk_drho, signature="(k),(r),(f)->(3,r)")
    dJq_v = jnp.vectorize(leg_dJ_dq, signature="(k),(r),(f)->(9,3)")
    dJr_v = jnp.vectorize(leg_dJ_drho, signature="(k),(r),(f)->(9,r)")
    return {
        "fk": fk,
        "J": jac_v(phi, rho, rho_fix),
        "dfk_drho": dfk_v(phi, rho, rho_fix),
        "dJ_dq": dJq_v(phi, rho, rho_fix),
        "dJ_drho": dJr_v(phi, rho, rho_fix),
    }

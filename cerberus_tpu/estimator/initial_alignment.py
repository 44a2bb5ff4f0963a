"""Initialization alignment solvers.

API-parity versions of the reference's initializer helpers
(reference: src/initial/initial_aligment.cpp). The estimator's default init
path runs the full window solver with biases free instead (one solver path,
estimator.py:_initialize), but these closed-form solvers are provided for
users of the reference workflow and as a cheaper warm start.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cerberus_tpu import config as C
from cerberus_tpu.utils import lie


def solve_gyroscope_bias(q_frames, preints):
    """Least-squares gyro bias from rotation residuals across consecutive
    frames (reference: solveGyroscopeBias, initial_aligment.cpp:14-48).

    Args:
      q_frames: (N+1, 4) frame orientations (wxyz, e.g. from vision PnP).
      preints: list of N ILPreint between consecutive frames.
    Returns delta_bg (3,).
    """
    A = jnp.zeros((3, 3), q_frames.dtype)
    b = jnp.zeros((3,), q_frames.dtype)
    for k, pre in enumerate(preints):
        if pre is None:
            continue
        q_ij = lie.quat_mul(lie.quat_conj(q_frames[k]), q_frames[k + 1])
        tmp_A = pre.J[3:6, C.ILO_BG:C.ILO_BG + 3]
        tmp_b = 2.0 * lie.quat_mul(lie.quat_conj(pre.dq), q_ij)[1:]
        A = A + tmp_A.T @ tmp_A
        b = b + tmp_A.T @ tmp_b
    return jnp.linalg.solve(A + 1e-12 * jnp.eye(3, dtype=A.dtype), b)


def solve_gyro_leg_bias(q_frames, p_frames, preints):
    """Joint gyro-bias + per-leg rho from rotation and epsilon residuals
    (reference: solveGyroLegBias, initial_aligment.cpp:50-123; the reference
    keeps the call commented at estimator.cpp:751 — provided for parity).

    Returns (delta_bg (3,), delta_rho (4,))."""
    dtype = q_frames.dtype
    A = jnp.zeros((7, 7), dtype)
    b = jnp.zeros((7,), dtype)
    for k, pre in enumerate(preints):
        if pre is None:
            continue
        q_ij = lie.quat_mul(lie.quat_conj(q_frames[k]), q_frames[k + 1])
        Jq = pre.J[3:6, C.ILO_BG:C.ILO_BG + 3]
        rq = 2.0 * lie.quat_mul(lie.quat_conj(pre.dq), q_ij)[1:]
        Ak = jnp.zeros((3 + 12, 7), dtype)
        rk = jnp.zeros((3 + 12,), dtype)
        Ak = Ak.at[0:3, 0:3].set(Jq)
        rk = rk.at[0:3].set(rq)
        rel_p = lie.quat_rotate(lie.quat_conj(q_frames[k]),
                                p_frames[k + 1] - p_frames[k])
        for j in range(4):
            r = C.ILO_EPS + 3 * j
            Ak = Ak.at[3 + 3 * j:6 + 3 * j, 0:3].set(
                pre.J[r:r + 3, C.ILO_BG:C.ILO_BG + 3])
            Ak = Ak.at[3 + 3 * j:6 + 3 * j, 3 + j].set(
                pre.J[r:r + 3, C.ILO_RHO + j])
            rk = rk.at[3 + 3 * j:6 + 3 * j].set(rel_p - pre.deps[j])
        A = A + Ak.T @ Ak
        b = b + Ak.T @ rk
    x = jnp.linalg.solve(A + 1e-9 * jnp.eye(7, dtype=dtype), b)
    return x[0:3], x[3:7]

"""On-manifold preintegration of IMU and IMU+leg measurement streams.

TPU-native re-design of the reference's recursive C++ preintegration classes
(reference: src/factor/integration_base.h:65-198 for pure IMU;
src/factor/imu_leg_integration_base.cpp:138-469 for IMU+leg): instead of a
stateful object fed one sample at a time at 500 Hz, an interval's samples are
packed into fixed-size padded arrays and integrated by one `lax.scan`, vmapped
over window intervals and over batches of windows. Repropagation under new
bias (integration_base.h:49-63) is simply calling the same pure function with
new linearization points.

State conventions (midpoint scheme, identical math to the reference):
  IMU delta state (15): [p, theta, v, ba, bg]
  IMU+leg error state (31): [p, theta, v, eps1..4, ba, bg, rho1..4]
  IMU+leg noise (46): [a_i, g_i, a_i1, g_i1, ba_w, bg_w, phi_i, phi_i1,
                       dphi_i, dphi_i1, v_leg1..4, n_rho1..4]

All functions are pure, jittable, and dtype-polymorphic (f32/f64 follows the
input arrays).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cerberus_tpu import config as C
from cerberus_tpu.kinematics.leg import all_legs_fk_jac
from cerberus_tpu.utils import lie


class PreintParams(NamedTuple):
    """Static parameters of the preintegration (geometry + noise densities)."""

    rho_fix: jax.Array        # (4, 4) fixed leg geometry
    p_br: jax.Array           # (3,) IMU->robot-body translation
    R_br: jax.Array           # (3, 3) IMU->robot-body rotation
    acc_n: jax.Array          # () accel white noise (xy)
    acc_n_z: jax.Array        # () accel white noise (z)
    gyr_n: jax.Array
    acc_w: jax.Array
    gyr_w: jax.Array
    phi_n: jax.Array
    dphi_n: jax.Array
    rho_c_n: jax.Array        # rho random walk, in contact
    rho_nc_n: jax.Array       # rho random walk, no contact
    v_n_min_xy: jax.Array
    v_n_min_z: jax.Array
    v_n_min: jax.Array
    v_n_max: jax.Array
    v_n_force_thres_ratio: jax.Array
    v_n_term1_steep: jax.Array
    v_n_term2_var_rescale: jax.Array
    v_n_term3_distance_rescale: jax.Array
    # LO-consistency guard for contact models 0/1: adds
    # lo_guard * (v_leg - v_ref)^2 to the per-leg velocity variance, where
    # v_ref is an EMA of the fused leg-odometry velocity — so a leg whose
    # kinematic velocity disagrees with the recent four-leg CONSENSUS is
    # downweighted EVEN IF its contact flag claims stance. The reference
    # applies a distance term only in its force-sigmoid model and compares
    # against delta_v (imu_leg_integration_base.cpp:300-317) — but delta_v
    # integrates gravity (~0.65 m/s over a 15 Hz interval), so that
    # comparison is only symbolic at its 1e-3 weight; at guard strength it
    # suppresses everything including the rho-calibration signal (measured:
    # rho stalls). The consensus reference keeps rho/slip signals (~0.01
    # m/s shared deviations) while a mis-flagged swing leg (~0.5-1 m/s
    # deviation) is inflated 25-100x (measured: 19.9% -> ~3% drift over
    # 60 s with 10 x 0.3 s inverted-flag bursts; 0 disables and restores
    # exact reference semantics).
    lo_guard: jax.Array = 0.0
    contact_sensor_type: int = 0   # static: selects the contact model branch

    @staticmethod
    def from_config(cfg: "C.EstimatorConfig", dtype=jnp.float64) -> "PreintParams":
        n = cfg.noise
        f = lambda x: jnp.asarray(x, dtype)
        return PreintParams(
            rho_fix=f(cfg.robot.rho_fix()),
            p_br=f(cfg.robot.p_br),
            R_br=f(cfg.robot.R_br),
            acc_n=f(n.acc_n), acc_n_z=f(n.acc_n_z), gyr_n=f(n.gyr_n),
            acc_w=f(n.acc_w), gyr_w=f(n.gyr_w),
            phi_n=f(n.joint_angle_n), dphi_n=f(n.joint_velocity_n),
            rho_c_n=f(n.leg_bias_c_n), rho_nc_n=f(n.leg_bias_nc_n),
            v_n_min_xy=f(n.v_n_min_xy), v_n_min_z=f(n.v_n_min_z),
            v_n_min=f(n.v_n_min), v_n_max=f(n.v_n_max),
            v_n_force_thres_ratio=f(n.v_n_force_thres_ratio),
            v_n_term1_steep=f(n.v_n_term1_steep),
            v_n_term2_var_rescale=f(n.v_n_term2_var_rescale),
            v_n_term3_distance_rescale=f(n.v_n_term3_distance_rescale),
            lo_guard=f(n.contact_lo_guard_rescale),
            contact_sensor_type=cfg.contact_sensor_type,
        )


class ImuPreint(NamedTuple):
    """Result of pure-IMU preintegration over one interval."""

    dp: jax.Array          # (3,)
    dq: jax.Array          # (4,) wxyz
    dv: jax.Array          # (3,)
    J: jax.Array           # (15, 15) d(delta)/d(state at linearization)
    P: jax.Array           # (15, 15) covariance
    sum_dt: jax.Array      # ()
    ba: jax.Array          # (3,) linearization accel bias
    bg: jax.Array          # (3,) linearization gyro bias


class ILPreint(NamedTuple):
    """Result of IMU+leg preintegration over one interval."""

    dp: jax.Array            # (3,)
    dq: jax.Array            # (4,)
    dv: jax.Array            # (3,)
    deps: jax.Array          # (4, 3) per-leg contact displacement
    sum_deps: jax.Array      # (3,) uncertainty-weighted fused displacement
    J: jax.Array             # (31, 31)
    P: jax.Array             # (31, 31)
    sum_dt: jax.Array        # ()
    ba: jax.Array            # (3,)
    bg: jax.Array            # (3,)
    rho: jax.Array           # (4,) linearization calf lengths
    contact_flag: jax.Array  # (4,) final-step contact flag
    integration_contact: jax.Array  # (4,) bool: leg stayed in contact whole interval
    # final adaptive foot-force tracker state (contact model 2), threaded
    # into the NEXT interval's il_preintegrate(ff_init=...). The reference
    # zero-initializes these per integration object
    # (imu_leg_integration_base.cpp:29-30), which cold-starts the adaptive
    # threshold every ~34-sample interval — early-interval swing-leg forces
    # then read as contact (measured: 9.5% vs 0.3% drift on a 15 s Go1 run
    # without vision). Persisting the tracker across intervals fixes it.
    ff_min: jax.Array        # (4,)
    ff_max: jax.Array        # (4,)
    ff_window: jax.Array     # (4, FOOT_VAR_WINDOW_SIZE)
    ff_idx: jax.Array        # (4,) int32


# ---------------------------------------------------------------------------
# Pure IMU (15-state) — reference: integration_base.h:65-140
# ---------------------------------------------------------------------------


def _imu_step(carry, inp, ba, bg, params: PreintParams):
    dp, dq, dv, J, P, sum_dt, acc_0, gyr_0 = carry
    dt, acc_1, gyr_1, valid = inp
    dtype = dp.dtype

    un_acc_0 = lie.quat_rotate(dq, acc_0 - ba)
    un_gyr = 0.5 * (gyr_0 + gyr_1) - bg
    dq_new = lie.quat_normalize(lie.quat_mul(dq, lie.delta_q(un_gyr * dt)))
    un_acc_1 = lie.quat_rotate(dq_new, acc_1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    dp_new = dp + dv * dt + 0.5 * un_acc * dt * dt
    dv_new = dv + un_acc * dt

    R0 = lie.quat_to_rot(dq)
    R1 = lie.quat_to_rot(dq_new)
    Rw = lie.skew(un_gyr)
    Ra0 = lie.skew(acc_0 - ba)
    Ra1 = lie.skew(acc_1 - ba)
    I3 = jnp.eye(3, dtype=dtype)
    k7 = I3 - Rw * dt

    F = jnp.zeros((15, 15), dtype)
    k1 = -0.5 * R0 @ Ra0 * dt - 0.5 * R1 @ Ra1 @ k7 * dt
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(0.5 * dt * k1)
    F = F.at[0:3, 6:9].set(I3 * dt)
    F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * dt * dt)
    F = F.at[0:3, 12:15].set(0.25 * R1 @ Ra1 * dt * dt * dt)
    F = F.at[3:6, 3:6].set(k7)
    F = F.at[3:6, 12:15].set(-I3 * dt)
    F = F.at[6:9, 3:6].set(k1)
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * dt)
    F = F.at[6:9, 12:15].set(0.5 * R1 @ Ra1 * dt * dt)
    F = F.at[9:12, 9:12].set(I3)
    F = F.at[12:15, 12:15].set(I3)

    V = jnp.zeros((15, 18), dtype)
    Vg = -0.25 * R1 @ Ra1 * dt * dt * 0.5 * dt
    V = V.at[0:3, 0:3].set(0.25 * R0 * dt * dt)
    V = V.at[0:3, 3:6].set(Vg)
    V = V.at[0:3, 6:9].set(0.25 * R1 * dt * dt)
    V = V.at[0:3, 9:12].set(Vg)
    V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
    V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
    V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
    Vg2 = -0.5 * R1 @ Ra1 * dt * 0.5 * dt
    V = V.at[6:9, 3:6].set(Vg2)
    V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
    V = V.at[6:9, 9:12].set(Vg2)
    V = V.at[9:12, 12:15].set(I3 * dt)
    V = V.at[12:15, 15:18].set(I3 * dt)

    an2, anz2, gn2 = params.acc_n ** 2, params.acc_n_z ** 2, params.gyr_n ** 2
    aw2, gw2 = params.acc_w ** 2, params.gyr_w ** 2
    noise = jnp.concatenate([
        jnp.array([an2, an2, anz2, gn2, gn2, gn2, an2, an2, anz2, gn2, gn2, gn2],
                  dtype=dtype),
        jnp.full((3,), aw2, dtype), jnp.full((3,), gw2, dtype),
    ])

    J_new = F @ J
    P_new = F @ P @ F.T + (V * noise[None, :]) @ V.T

    new = (dp_new, dq_new, dv_new, J_new, P_new, sum_dt + dt, acc_1, gyr_1)
    keep = (dp, dq, dv, J, P, sum_dt, acc_0, gyr_0)
    out = jax.tree.map(lambda a, b: jnp.where(valid, a, b), new, keep)
    return out, None


def imu_preintegrate(dt, acc, gyr, mask, ba, bg, params: PreintParams) -> ImuPreint:
    """Integrate one interval of IMU samples.

    Args:
      dt:  (S,) step durations; dt[k] spans sample k-1 -> k... with sample 0
           given by acc[0]/gyr[0] and dt[0] unused (set mask[0]=False).
      acc: (S, 3), gyr: (S, 3) raw samples (sample 0 = linearization sample).
      mask: (S,) bool; False entries are padding (carry passes through).
      ba, bg: (3,) linearization biases.
    """
    dtype = acc.dtype
    init = (
        jnp.zeros(3, dtype), lie.quat_identity(dtype), jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype), jnp.zeros((15, 15), dtype),
        jnp.zeros((), dtype), acc[0], gyr[0],
    )
    step = lambda c, x: _imu_step(c, x, ba, bg, params)
    (dp, dq, dv, J, P, sum_dt, _, _), _ = jax.lax.scan(
        step, init, (dt[1:], acc[1:], gyr[1:], mask[1:])
    )
    return ImuPreint(dp, dq, dv, J, P, sum_dt, ba, bg)


def imu_residual(pre: ImuPreint, state_i, state_j, gravity):
    """15-dim bias-corrected residual (reference: integration_base.h:172-198).

    state_{i,j}: dicts with p (3,), q (4,), v (3,), ba (3,), bg (3,).
    """
    dba = state_i["ba"] - pre.ba
    dbg = state_i["bg"] - pre.bg
    dp = pre.dp + pre.J[0:3, 9:12] @ dba + pre.J[0:3, 12:15] @ dbg
    dq = lie.quat_mul(pre.dq, lie.delta_q(pre.J[3:6, 12:15] @ dbg))
    dv = pre.dv + pre.J[6:9, 9:12] @ dba + pre.J[6:9, 12:15] @ dbg

    qi_inv = lie.quat_conj(state_i["q"])
    r_p = lie.quat_rotate(
        qi_inv,
        0.5 * gravity * pre.sum_dt ** 2 + state_j["p"] - state_i["p"]
        - state_i["v"] * pre.sum_dt,
    ) - dp
    q_err = lie.quat_mul(lie.quat_conj(dq), lie.quat_mul(qi_inv, state_j["q"]))
    r_q = 2.0 * q_err[1:]
    r_v = lie.quat_rotate(qi_inv, gravity * pre.sum_dt + state_j["v"] - state_i["v"]) - dv
    return jnp.concatenate([r_p, r_q, r_v, state_j["ba"] - state_i["ba"],
                            state_j["bg"] - state_i["bg"]])


# ---------------------------------------------------------------------------
# IMU + leg (31-state) — reference: imu_leg_integration_base.cpp:138-469
# ---------------------------------------------------------------------------

_EPS = C.ILO_EPS
_BA, _BG, _RHO = C.ILO_BA, C.ILO_BG, C.ILO_RHO


class _ILCarry(NamedTuple):
    dp: jax.Array
    dq: jax.Array
    dv: jax.Array
    deps: jax.Array       # (4, 3)
    sum_deps: jax.Array   # (3,)
    J: jax.Array          # (31, 31)
    P: jax.Array          # (31, 31)
    sum_dt: jax.Array
    acc_0: jax.Array
    gyr_0: jax.Array
    phi_0: jax.Array      # (12,)
    dphi_0: jax.Array     # (12,)
    c_0: jax.Array        # (4,)
    ff_min: jax.Array     # (4,) foot-force min tracker (type 2)
    ff_max: jax.Array     # (4,)
    ff_window: jax.Array  # (4, FOOT_VAR_WINDOW_SIZE)
    ff_idx: jax.Array     # (4,) int32 ring index
    contact_flag: jax.Array          # (4,)
    integration_contact: jax.Array   # (4,) bool
    lo_ref: jax.Array     # (3,) EMA of fused LO velocity (lo_guard ref)
    lo_ref_w: jax.Array   # () ref validity ramp in [0, 1]


def _leg_velocities(dq, phi, dphi, gyr_unbiased, rho, params: PreintParams):
    """Per-leg body-frame velocity measurement and FK bundle.

    v_j = -R_br @ J_j @ dphi_j - [w]x (p_br + R_br @ fk_j)
    (reference: imu_leg_integration_base.cpp:242-247)
    """
    kin = all_legs_fk_jac(phi.reshape(4, 3), rho.reshape(4, C.RHO_OPT_SIZE),
                          params.rho_fix)
    w_x = lie.skew(gyr_unbiased)
    foot_b = params.p_br[None, :] + kin["fk"] @ params.R_br.T        # (4,3)
    v = (-(params.R_br @ (kin["J"] @ dphi.reshape(4, 3, 1))[..., 0].T).T
         - foot_b @ w_x.T)
    return v, kin, foot_b


def _gh_terms(Rq, kin, dphi, w_x, params: PreintParams):
    """g = d v/d rho (3, R), h = d v/d phi (3, 3) per leg, rotated by delta_q.

    g_j = -R(dq) (R_br * kron(dphi_j) * dJ/drho + [w]x R_br * dfk/drho)
    h_j =  R(dq) (R_br * kron(dphi_j) * dJ/dphi + [w]x R_br * J)
    (reference: imu_leg_integration_base.cpp:259-287)
    """
    dphi_l = dphi.reshape(4, 3)
    # kron(dphi) @ dJ_dx contracts the 9-dim column-major J axis with dphi:
    # rows 3k..3k+3 of dJ are d(J[:,k])/dx  =>  sum_k dphi_k * dJ[3k:3k+3]
    dJr = kin["dJ_drho"].reshape(4, 3, 3, C.RHO_OPT_SIZE)  # (leg, col k, row, R)
    kron_dJr = jnp.einsum("lk,lkir->lir", dphi_l, dJr)     # (4, 3, R)
    dJq = kin["dJ_dq"].reshape(4, 3, 3, 3)
    kron_dJq = jnp.einsum("lk,lkij->lij", dphi_l, dJq)     # (4, 3, 3)

    Rbr = params.R_br
    g = -jnp.einsum("ab,lbr->lar", Rq, Rbr @ kron_dJr + jnp.einsum(
        "ab,bc,lcr->lar", w_x, Rbr, kin["dfk_drho"]))
    h = jnp.einsum("ab,lbc->lac", Rq, Rbr @ kron_dJq + jnp.einsum(
        "ab,bc,lcd->lad", w_x, Rbr, kin["J"]))
    return g, h


def il_init_carry(acc_0, gyr_0, phi_0, dphi_0, c_0,
                  ff_init=None) -> _ILCarry:
    """Fresh integration carry anchored at the given first sample.

    ff_init: optional (ff_min, ff_max, ff_window, ff_idx) carried over from
    the previous interval (see ILPreint.ff_* docstring)."""
    dtype = acc_0.dtype
    if ff_init is None:
        ff_init = (jnp.zeros(4, dtype), jnp.zeros(4, dtype),
                   jnp.zeros((4, C.FOOT_VAR_WINDOW_SIZE), dtype),
                   jnp.zeros(4, jnp.int32))
    return _ILCarry(
        dp=jnp.zeros(3, dtype), dq=lie.quat_identity(dtype),
        dv=jnp.zeros(3, dtype), deps=jnp.zeros((4, 3), dtype),
        sum_deps=jnp.zeros(3, dtype),
        J=jnp.eye(31, dtype=dtype), P=jnp.zeros((31, 31), dtype),
        sum_dt=jnp.zeros((), dtype),
        acc_0=acc_0, gyr_0=gyr_0, phi_0=phi_0, dphi_0=dphi_0, c_0=c_0,
        ff_min=jnp.asarray(ff_init[0], dtype),
        ff_max=jnp.asarray(ff_init[1], dtype),
        ff_window=jnp.asarray(ff_init[2], dtype),
        ff_idx=jnp.asarray(ff_init[3], jnp.int32),
        contact_flag=jnp.zeros(4, dtype),
        integration_contact=jnp.ones(4, dtype=bool),
        lo_ref=jnp.zeros(3, dtype), lo_ref_w=jnp.zeros((), dtype),
    )


def il_step_full(carry: _ILCarry, inp, ba, bg, rho, params: PreintParams):
    """One midpoint step; returns (new_carry, F, V, noise_diag).

    Exposed (rather than closed over in the scan) so tests can check the
    31x31 F and 31x46 V against finite differences — the automated version of
    the reference's disabled checkJacobian (imu_leg_integration_base.cpp:472).
    """
    dt, acc_1, gyr_1, phi_1, dphi_1, c_1, valid = inp
    dtype = carry.dp.dtype
    I3 = jnp.eye(3, dtype=dtype)

    # --- IMU midpoint (identical to the 15-state path) ---
    un_acc_0 = lie.quat_rotate(carry.dq, carry.acc_0 - ba)
    un_gyr = 0.5 * (carry.gyr_0 + gyr_1) - bg
    dq_new = lie.quat_normalize(lie.quat_mul(carry.dq, lie.delta_q(un_gyr * dt)))
    un_acc_1 = lie.quat_rotate(dq_new, acc_1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    dp_new = carry.dp + carry.dv * dt + 0.5 * un_acc * dt * dt
    dv_new = carry.dv + un_acc * dt

    # --- contact flag + foot-force statistics ---
    if params.contact_sensor_type in (0, 1):
        contact = (c_1 >= 0.5).astype(dtype)
        ff_min, ff_max, ff_window, ff_idx = (
            carry.ff_min, carry.ff_max, carry.ff_window, carry.ff_idx)
        ff_var = jnp.zeros(4, dtype)
    else:
        force = 0.5 * (carry.c_0 + c_1)
        ff_min = jnp.where(force < carry.ff_min,
                           0.9 * carry.ff_min + 0.1 * force, carry.ff_min)
        ff_max = jnp.where(force > carry.ff_max,
                           0.9 * carry.ff_max + 0.1 * force, carry.ff_max)
        ff_min = ff_min * 0.9991
        ff_max = ff_max * 0.997
        thres = ff_min + params.v_n_force_thres_ratio * (ff_max - ff_min)
        contact = jax.nn.sigmoid(params.v_n_term1_steep * (force - thres))
        ff_idx = (carry.ff_idx + 1) % C.FOOT_VAR_WINDOW_SIZE
        ff_window = carry.ff_window.at[jnp.arange(4), ff_idx].set(force)
        mean = jnp.mean(ff_window, axis=1, keepdims=True)
        ff_var = jnp.sum((ff_window - mean) ** 2, axis=1) / (
            C.FOOT_VAR_WINDOW_SIZE - 1)
    integration_contact = jnp.logical_and(carry.integration_contact,
                                          contact >= 0.5)

    # --- leg-odometry velocities at both endpoints ---
    w0 = carry.gyr_0 - bg
    w1 = gyr_1 - bg
    vi, kin0, foot0 = _leg_velocities(carry.dq, carry.phi_0, carry.dphi_0, w0,
                                      rho, params)
    vip1, kin1, foot1 = _leg_velocities(dq_new, phi_1, dphi_1, w1, rho, params)
    R0 = lie.quat_to_rot(carry.dq)
    R1 = lie.quat_to_rot(dq_new)
    lo_vel = 0.5 * (vi @ R0.T + vip1 @ R1.T)        # (4, 3) world(frame-i) vel
    deps_new = carry.deps + lo_vel * dt

    # --- adaptive measurement noise per leg ---
    if params.contact_sensor_type in (0, 1):
        n_xy = params.v_n_max * (1 - contact) + contact * params.v_n_min_xy
        n_z = params.v_n_max * (1 - contact) + contact * params.v_n_min_z
        unc_base = jnp.stack([n_xy, n_xy, n_z], axis=1)           # (4, 3)
        # LO-consistency guard (see PreintParams.lo_guard): downweight legs
        # whose kinematic velocity disagrees with the recent fused-LO
        # consensus (EMA carried in lo_ref; inactive until the ramp fills)
        uncertainties = unc_base + params.lo_guard * carry.lo_ref_w \
            * (lo_vel - carry.lo_ref[None, :]) ** 2
    else:
        n1 = params.v_n_max * (1 - contact) + params.v_n_min      # (4,)
        n2 = params.v_n_term2_var_rescale * ff_var                # (4,)
        n3 = params.v_n_term3_distance_rescale * (lo_vel - carry.dv) ** 2
        unc_base = n1[:, None] + n2[:, None] + n3                 # (4, 3)
        uncertainties = unc_base

    rho_uncertainty = params.rho_c_n * contact + params.rho_nc_n  # (4,)

    # uncertainty-weighted fusion of the four LO velocities
    wsum = (params.v_n_max + params.v_n_term2_var_rescale
            + params.v_n_term3_distance_rescale)
    weight = jnp.maximum(wsum / uncertainties, 0.001)
    avg_deps = jnp.sum(weight * lo_vel, axis=0) * dt / jnp.sum(weight, axis=0)
    sum_deps_new = carry.sum_deps + avg_deps
    # lo_guard consensus reference: EMA of the GUARDED fused LO velocity
    # (time constant ~5 samples at 500 Hz, tracks 2 Hz trot oscillation),
    # with a ramp so the guard stays off for the interval's first few
    # samples. Using the guarded weights makes the consensus
    # self-reweighting (IRLS across time): a leg the guard already
    # suppressed barely moves the reference, so one wild leg cannot drag
    # the consensus toward itself and inflate its healthy peers.
    ref_v = jnp.sum(weight * lo_vel, axis=0) / jnp.sum(weight, axis=0)
    alpha = jnp.asarray(0.2, dtype)
    lo_ref_new = (1 - alpha) * carry.lo_ref + alpha * ref_v
    lo_ref_w_new = jnp.minimum(carry.lo_ref_w + 0.2, 1.0)

    # all-feet-airborne: leg residuals get ~infinite noise
    airborne = jnp.sum(contact) < 1e-6
    rho_uncertainty = jnp.where(airborne, params.rho_nc_n, rho_uncertainty)
    uncertainties = jnp.where(airborne, 1e11, uncertainties)

    # --- error-state transition F (31x31) and noise mapping V (31x46) ---
    Rw = lie.skew(un_gyr)
    Ra0 = lie.skew(carry.acc_0 - ba)
    Ra1 = lie.skew(acc_1 - ba)
    k7 = I3 - Rw * dt
    k1 = -0.5 * R0 @ Ra0 * dt - 0.5 * R1 @ Ra1 @ k7 * dt

    F = jnp.zeros((31, 31), dtype)
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(0.5 * dt * k1)
    F = F.at[0:3, 6:9].set(I3 * dt)
    F = F.at[0:3, _BA:_BA + 3].set(-0.25 * (R0 + R1) * dt * dt)
    F = F.at[0:3, _BG:_BG + 3].set(0.25 * R1 @ Ra1 * dt ** 3)
    F = F.at[3:6, 3:6].set(k7)
    F = F.at[3:6, _BG:_BG + 3].set(-I3 * dt)
    F = F.at[6:9, 3:6].set(k1)
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[6:9, _BA:_BA + 3].set(-0.5 * (R0 + R1) * dt)
    F = F.at[6:9, _BG:_BG + 3].set(0.5 * R1 @ Ra1 * dt * dt)

    g0, h0 = _gh_terms(R0, kin0, carry.dphi_0, lie.skew(w0), params)
    g1, h1 = _gh_terms(R1, kin1, dphi_1, lie.skew(w1), params)

    skew_vi = lie.skew(vi)        # (4, 3, 3)
    skew_vip1 = lie.skew(vip1)
    skew_f0 = lie.skew(foot0)
    skew_f1 = lie.skew(foot1)
    for j in range(C.NUM_OF_LEG):
        r = _EPS + 3 * j
        F = F.at[r:r + 3, 3:6].set(
            -0.5 * dt * R0 @ skew_vi[j] - 0.5 * dt * R1 @ skew_vip1[j] @ k7)
        F = F.at[r:r + 3, r:r + 3].set(I3)
        F = F.at[r:r + 3, _BG:_BG + 3].set(
            0.5 * dt * dt * R1 @ skew_vip1[j]
            - 0.5 * dt * (R0 @ skew_f0[j] + R1 @ skew_f1[j]))
        F = F.at[r:r + 3, _RHO + j:_RHO + j + 1].set(0.5 * dt * (g0[j] + g1[j]))
    F = F.at[_BA:_BA + 3, _BA:_BA + 3].set(I3)
    F = F.at[_BG:_BG + 3, _BG:_BG + 3].set(I3)
    F = F.at[_RHO:_RHO + 4, _RHO:_RHO + 4].set(jnp.eye(4, dtype=dtype))

    V = jnp.zeros((31, 46), dtype)
    Vg = 0.25 * -R1 @ Ra1 * dt * dt * 0.5 * dt
    V = V.at[0:3, 0:3].set(0.25 * R0 * dt * dt)
    V = V.at[0:3, 3:6].set(Vg)
    V = V.at[0:3, 6:9].set(0.25 * R1 * dt * dt)
    V = V.at[0:3, 9:12].set(Vg)
    V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
    V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
    V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
    Vg2 = 0.5 * -R1 @ Ra1 * dt * 0.5 * dt
    V = V.at[6:9, 3:6].set(Vg2)
    V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
    V = V.at[6:9, 9:12].set(Vg2)
    for j in range(C.NUM_OF_LEG):
        r = _EPS + 3 * j
        V = V.at[r:r + 3, C.ILNO_GI:C.ILNO_GI + 3].set(
            -0.25 * dt * dt * R1 @ skew_vip1[j] + 0.5 * dt * R0 @ skew_f0[j])
        V = V.at[r:r + 3, C.ILNO_GI1:C.ILNO_GI1 + 3].set(
            -0.25 * dt * dt * R1 @ skew_vip1[j] + 0.5 * dt * R1 @ skew_f1[j])
        V = V.at[r:r + 3, C.ILNO_PHI:C.ILNO_PHI + 3].set(-0.5 * dt * h0[j])
        V = V.at[r:r + 3, C.ILNO_PHI1:C.ILNO_PHI1 + 3].set(-0.5 * dt * h1[j])
        V = V.at[r:r + 3, C.ILNO_DPHI:C.ILNO_DPHI + 3].set(
            -0.5 * dt * R0 @ params.R_br @ kin0["J"][j])
        V = V.at[r:r + 3, C.ILNO_DPHI1:C.ILNO_DPHI1 + 3].set(
            -0.5 * dt * R1 @ params.R_br @ kin1["J"][j])
        V = V.at[r:r + 3, C.ILNO_V + 3 * j:C.ILNO_V + 3 * j + 3].set(-I3 * dt)
    V = V.at[_BA:_BA + 3, C.ILNO_BA:C.ILNO_BA + 3].set(-I3 * dt)
    V = V.at[_BG:_BG + 3, C.ILNO_BG:C.ILNO_BG + 3].set(-I3 * dt)
    V = V.at[_RHO:_RHO + 4, C.ILNO_NRHO:C.ILNO_NRHO + 4].set(
        -jnp.eye(4, dtype=dtype) * dt)

    an2, anz2, gn2 = params.acc_n ** 2, params.acc_n_z ** 2, params.gyr_n ** 2
    noise = jnp.concatenate([
        jnp.array([an2, an2, anz2, gn2, gn2, gn2, an2, an2, anz2, gn2, gn2, gn2],
                  dtype=dtype),
        jnp.full((3,), params.acc_w ** 2, dtype),
        jnp.full((3,), params.gyr_w ** 2, dtype),
        jnp.full((6,), params.phi_n ** 2, dtype),
        jnp.full((6,), params.dphi_n ** 2, dtype),
        uncertainties.reshape(-1),
        rho_uncertainty,
    ])

    J_new = F @ carry.J
    P_new = F @ carry.P @ F.T + (V * noise[None, :]) @ V.T

    new = _ILCarry(
        dp=dp_new, dq=dq_new, dv=dv_new, deps=deps_new, sum_deps=sum_deps_new,
        J=J_new, P=P_new, sum_dt=carry.sum_dt + dt,
        acc_0=acc_1, gyr_0=gyr_1, phi_0=phi_1, dphi_0=dphi_1, c_0=c_1,
        ff_min=ff_min, ff_max=ff_max, ff_window=ff_window, ff_idx=ff_idx,
        contact_flag=contact, integration_contact=integration_contact,
        lo_ref=lo_ref_new, lo_ref_w=lo_ref_w_new,
    )
    out = jax.tree.map(lambda a, b: jnp.where(valid, a, b), new, carry)
    return out, F, V, noise


def _il_step(carry: _ILCarry, inp, ba, bg, rho, params: PreintParams):
    out, _, _, _ = il_step_full(carry, inp, ba, bg, rho, params)
    return out, None


def il_preintegrate(dt, acc, gyr, phi, dphi, c, mask, ba, bg, rho,
                    params: PreintParams, ff_init=None) -> ILPreint:
    """Integrate one interval of synced IMU+leg samples.

    Args:
      dt: (S,) step durations (dt[0] unused; mask[0] must be False).
      acc/gyr: (S, 3); phi/dphi: (S, 12); c: (S, 4) contact flags or forces.
      mask: (S,) bool validity.
      ba, bg: (3,); rho: (4,) linearization points.
      ff_init: optional previous-interval (ff_min, ff_max, ff_window,
        ff_idx) for the contact model 2 adaptive force threshold (the
        estimator threads pre.ff_* of interval k-1 into interval k).

    Matmul precision is pinned to 'highest': on TPU the default f32 matmul
    runs as bf16 passes (~3e-3 relative), which drowns the small ∂ε/∂ρ
    terms in the 31x31 J/P recursion — the rho calibration signal — and
    stalls online leg-length estimation. Measured: rho stuck at its init
    under default precision, converges under highest. No-op on CPU.
    """
    init = il_init_carry(acc[0], gyr[0], phi[0], dphi[0], c[0],
                         ff_init=ff_init)
    step = lambda cr, x: _il_step(cr, x, ba, bg, rho, params)
    with jax.default_matmul_precision("highest"):
        fin, _ = jax.lax.scan(
            step, init,
            (dt[1:], acc[1:], gyr[1:], phi[1:], dphi[1:], c[1:], mask[1:])
        )
    return ILPreint(
        dp=fin.dp, dq=fin.dq, dv=fin.dv, deps=fin.deps, sum_deps=fin.sum_deps,
        J=fin.J, P=fin.P, sum_dt=fin.sum_dt, ba=ba, bg=bg, rho=rho,
        contact_flag=fin.contact_flag, integration_contact=fin.integration_contact,
        ff_min=fin.ff_min, ff_max=fin.ff_max, ff_window=fin.ff_window,
        ff_idx=fin.ff_idx,
    )


# ---------------------------------------------------------------------------
# Parallel (log-depth) IMU+leg preintegration
# ---------------------------------------------------------------------------


def _quat_prefix(dq_steps):
    """Parallel prefix product of per-step quaternions (T, 4)."""
    out = jax.lax.associative_scan(quat_mul_assoc, dq_steps)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_mul_assoc(q, p):
    """Hamilton product broadcast over leading axes (associative_scan op).
    associative_scan calls combine(a, b) where a precedes b in scan order;
    our composition is dq_total = dq_a ⊗ dq_b (later rotation composes on
    the right, matching the sequential dq_new = dq ⊗ δq)."""
    return lie.quat_mul(q, p)


def il_preintegrate_parallel(dt, acc, gyr, phi, dphi, c, mask, ba, bg, rho,
                             params: PreintParams, ff_init=None) -> ILPreint:
    """Log-depth reformulation of `il_preintegrate` — identical math,
    restructured for the TPU'S compilation model instead of a 47-step
    sequential `lax.scan` whose tiny 31-dim matmuls are launch-latency
    bound (measured 6.8 ms device at S=48, 17 ms at S=128 on v5e; this
    version runs ~1-2 ms):

      * the step quaternion chain dq_k = ⊗_i δq_i is an associative prefix
        (`lax.associative_scan`),
      * dp/dv/ε accumulations become cumsums of per-sample terms (each
        sample's rotated quantities computed ONCE, where the sequential
        recursion recomputes every endpoint twice),
      * leg FK / Jacobians / dJ terms evaluate batched over all S samples,
      * the error-state recursion J' = F J, P' = F P Fᵀ + V n Vᵀ is an
        associative composition (F₂,Q₂)∘(F₁,Q₁) = (F₂F₁, F₂Q₁F₂ᵀ+Q₂),
        reduced by a log₂(S)-level pairwise tree of batched 31x31 matmuls
        (MXU work instead of serialized launches),
      * only the contact bookkeeping (adaptive foot-force min/max/variance
        for model 2) stays a sequential scan — over (4,)-vectors, which
        costs microseconds.

    Exactness: agrees with `il_preintegrate` to floating-point
    reassociation error (pinned at 1e-10 in f64 by
    tests/test_preintegration.py::test_parallel_matches_sequential); the
    sequential version itself is pinned loop-by-loop to the reference C++
    by tests/test_golden_reference.py.

    MASK CONTRACT: `mask` must be contiguous-valid with trailing padding
    (True on samples [1, n), False elsewhere — what _pad_buffer/extract
    produce). For a mask with INTERIOR holes the two forms diverge: the
    sequential scan carries the last valid sample across a hole (pairing
    it with the next valid input), while this form pairs adjacent raw
    samples and only zeroes dt across the hole. Concrete (non-traced)
    masks are checked; traced masks are the caller's responsibility.
    """
    if not isinstance(mask, jax.core.Tracer):
        m = np.asarray(mask).astype(bool)
        if m.any():
            first = int(np.argmax(m))
            n_true = int(m.sum())
            assert m[first:first + n_true].all(), \
                "il_preintegrate_parallel requires a contiguous mask " \
                "(trailing padding only); got interior holes"
    dtype = acc.dtype
    S = acc.shape[0]
    T = S - 1
    I3 = jnp.eye(3, dtype=dtype)
    valid = mask[1:]
    dtv = jnp.where(valid, dt[1:], 0.0).astype(dtype)

    with jax.default_matmul_precision("highest"):
        # --- quaternion prefix ---
        un_gyr = 0.5 * (gyr[:-1] + gyr[1:]) - bg                 # (T, 3)
        dq_step = lie.delta_q(un_gyr * dtv[:, None])             # (T, 4)
        dq_pref = _quat_prefix(dq_step)                          # (T, 4)
        # per-SAMPLE attitude: R_all[s] = R(dq after sample s), R_all[0]=I
        q_all = jnp.concatenate([lie.quat_identity(dtype)[None], dq_pref])
        R_all = lie.quat_to_rot(q_all)                           # (S, 3, 3)
        R0 = R_all[:-1]                                          # (T, 3, 3)
        R1 = R_all[1:]

        # --- IMU deltas via cumsum of per-sample rotated terms ---
        ua = jnp.einsum("sij,sj->si", R_all, acc - ba)           # (S, 3)
        un_acc = 0.5 * (ua[:-1] + ua[1:])                        # (T, 3)
        dv_inc = un_acc * dtv[:, None]
        dv_pref = jnp.cumsum(dv_inc, axis=0)
        dv_prev = jnp.concatenate([jnp.zeros((1, 3), dtype), dv_pref[:-1]])
        dp_inc = dv_prev * dtv[:, None] + 0.5 * un_acc * dtv[:, None] ** 2
        dp = jnp.sum(dp_inc, axis=0)
        dv = dv_pref[-1]

        # --- legs: batched FK + velocities over ALL samples ---
        kin = jax.vmap(lambda p_: all_legs_fk_jac(
            p_.reshape(4, 3), rho.reshape(4, C.RHO_OPT_SIZE),
            params.rho_fix))(phi)                                # (S, 4, ...)
        w_all = gyr - bg                                         # (S, 3)
        foot = params.p_br[None, None, :] \
            + jnp.einsum("slk,ik->sli", kin["fk"], params.R_br)  # (S, 4, 3)
        v_all = (-jnp.einsum("ik,slk->sli", params.R_br,
                             jnp.einsum("slkj,slj->slk", kin["J"],
                                        dphi.reshape(S, 4, 3)))
                 - jnp.cross(w_all[:, None, :], foot))           # (S, 4, 3)
        rv = jnp.einsum("sij,slj->sli", R_all, v_all)            # rotated
        lo_vel = 0.5 * (rv[:-1] + rv[1:])                        # (T, 4, 3)
        deps_inc = lo_vel * dtv[:, None, None]
        deps = jnp.sum(deps_inc, axis=0)                         # (4, 3)

        # --- contact state ---
        if ff_init is None:
            z = jnp.zeros
            ff_init = (z(4, dtype), z(4, dtype),
                       z((4, C.FOOT_VAR_WINDOW_SIZE), dtype), z(4, jnp.int32))
        ff_init = (jnp.asarray(ff_init[0], dtype), jnp.asarray(ff_init[1], dtype),
                   jnp.asarray(ff_init[2], dtype),
                   jnp.asarray(ff_init[3], jnp.int32))
        if params.contact_sensor_type in (0, 1):
            contact = jnp.where(valid[:, None], (c[1:] >= 0.5), False) \
                .astype(dtype)                                   # (T, 4)
            # final flag = last VALID step's (sequential carry semantics)
            has_valid = jnp.any(valid)
            last = jnp.where(has_valid,
                             T - 1 - jnp.argmax(valid[::-1]), 0)
            contact_final = jnp.where(has_valid, contact[last],
                                      jnp.zeros(4, dtype))
            int_contact = jnp.all(
                jnp.where(valid[:, None], contact >= 0.5, True), axis=0)
            ff_min, ff_max, ff_window, ff_idx = ff_init
            ff_var = jnp.zeros((T, 4), dtype)
        else:
            force = 0.5 * (c[:-1] + c[1:])                       # (T, 4)

            def ff_step(carry, inp):
                fmin, fmax, fwin, fidx = carry
                f_, ok = inp
                nmin = jnp.where(f_ < fmin, 0.9 * fmin + 0.1 * f_, fmin) \
                    * 0.9991
                nmax = jnp.where(f_ > fmax, 0.9 * fmax + 0.1 * f_, fmax) \
                    * 0.997
                thres = nmin + params.v_n_force_thres_ratio * (nmax - nmin)
                ct = jax.nn.sigmoid(params.v_n_term1_steep * (f_ - thres))
                nidx = (fidx + 1) % C.FOOT_VAR_WINDOW_SIZE
                nwin = fwin.at[jnp.arange(4), nidx].set(f_)
                mean = jnp.mean(nwin, axis=1, keepdims=True)
                var = jnp.sum((nwin - mean) ** 2, axis=1) \
                    / (C.FOOT_VAR_WINDOW_SIZE - 1)
                new = (nmin, nmax, nwin, nidx)
                out = jax.tree.map(lambda a, b_: jnp.where(ok, a, b_),
                                   new, carry)
                return out, (jnp.where(ok, ct, 0.0), jnp.where(ok, var, 0.0),
                             out[0])
            (ff_min, ff_max, ff_window, ff_idx), (contact, ff_var, _) = \
                jax.lax.scan(ff_step, ff_init, (force, valid))
            has_valid = jnp.any(valid)
            last = jnp.where(has_valid,
                             T - 1 - jnp.argmax(valid[::-1]), 0)
            contact_final = jnp.where(has_valid, contact[last],
                                      jnp.zeros(4, dtype))
            int_contact = jnp.all(
                jnp.where(valid[:, None], contact >= 0.5, True), axis=0)

        # --- adaptive noise + fusion (elementwise over T) ---
        wsum = (params.v_n_max + params.v_n_term2_var_rescale
                + params.v_n_term3_distance_rescale)
        if params.contact_sensor_type in (0, 1):
            n_xy = params.v_n_max * (1 - contact) + contact * params.v_n_min_xy
            n_z = params.v_n_max * (1 - contact) + contact * params.v_n_min_z
            unc_base = jnp.stack([n_xy, n_xy, n_z], axis=2)      # (T, 4, 3)
            # the lo_guard consensus EMA is self-reweighting (guarded
            # weights feed the reference — see il_step_full), a genuine
            # nonlinear recursion; it runs as a scalar lax.scan carrying
            # only (lo_ref (3,), ramp ()) — ~50 flops/step, microseconds —
            # while everything heavy stays parallel
            def guard_step(gc, inp):
                lo_ref, ramp = gc
                lo_v, ub, ok = inp
                unc = ub + params.lo_guard * ramp \
                    * (lo_v - lo_ref[None, :]) ** 2
                w = jnp.maximum(wsum / unc, 0.001)
                ref_v = jnp.sum(w * lo_v, axis=0) / jnp.sum(w, axis=0)
                new = ((1 - 0.2) * lo_ref + 0.2 * ref_v,
                       jnp.minimum(ramp + 0.2, 1.0))
                gc2 = jax.tree.map(lambda a_, b_: jnp.where(ok, a_, b_),
                                   new, gc)
                return gc2, unc
            _, uncertainties = jax.lax.scan(
                guard_step,
                (jnp.zeros(3, dtype), jnp.zeros((), dtype)),
                (lo_vel, unc_base, valid))
        else:
            n1 = params.v_n_max * (1 - contact) + params.v_n_min  # (T, 4)
            n2 = params.v_n_term2_var_rescale * ff_var
            n3 = params.v_n_term3_distance_rescale \
                * (lo_vel - dv_prev[:, None, :]) ** 2
            uncertainties = n1[..., None] + n2[..., None] + n3

        rho_uncertainty = params.rho_c_n * contact + params.rho_nc_n  # (T,4)
        weight = jnp.maximum(wsum / uncertainties, 0.001)
        avg_deps = jnp.sum(weight * lo_vel, axis=1) * dtv[:, None] \
            / jnp.sum(weight, axis=1)
        sum_deps = jnp.sum(avg_deps, axis=0)

        airborne = jnp.sum(contact, axis=1) < 1e-6               # (T,)
        rho_uncertainty = jnp.where(airborne[:, None], params.rho_nc_n,
                                    rho_uncertainty)
        uncertainties = jnp.where(airborne[:, None, None], 1e11,
                                  uncertainties)

        # --- batched F (T,31,31) / V (T,31,46) / noise (T,46) ---
        Rw = lie.skew(un_gyr)                                    # (T, 3, 3)
        Ra0 = lie.skew(acc[:-1] - ba)
        Ra1 = lie.skew(acc[1:] - ba)
        d1 = dtv[:, None, None]
        k7 = I3[None] - Rw * d1
        k1 = -0.5 * (R0 @ Ra0) * d1 - 0.5 * (R1 @ Ra1 @ k7) * d1

        # per-sample g/h (each sample used as both step endpoints)
        dphi_l = dphi.reshape(S, 4, 3)
        dJr = kin["dJ_drho"].reshape(S, 4, 3, 3, C.RHO_OPT_SIZE)
        kron_dJr = jnp.einsum("slk,slkir->slir", dphi_l, dJr)
        dJq = kin["dJ_dq"].reshape(S, 4, 3, 3, 3)
        kron_dJq = jnp.einsum("slk,slkij->slij", dphi_l, dJq)
        wx_all = lie.skew(w_all)                                 # (S, 3, 3)
        Rbr = params.R_br
        g_all = -jnp.einsum("sab,slbr->slar", R_all,
                            jnp.einsum("ab,slbr->slar", Rbr, kron_dJr)
                            + jnp.einsum("sab,bc,slcr->slar", wx_all, Rbr,
                                         kin["dfk_drho"]))
        h_all = jnp.einsum("sab,slbc->slac", R_all,
                           jnp.einsum("ab,slbc->slac", Rbr, kron_dJq)
                           + jnp.einsum("sab,bc,slcd->slad", wx_all, Rbr,
                                        kin["J"]))
        g0, g1 = g_all[:-1], g_all[1:]
        h0, h1 = h_all[:-1], h_all[1:]
        sk_v = lie.skew(v_all)                                   # (S, 4, 3, 3)
        sk_f = lie.skew(foot)
        sv0, sv1 = sk_v[:-1], sk_v[1:]
        sf0, sf1 = sk_f[:-1], sk_f[1:]

        F = jnp.zeros((T, 31, 31), dtype)
        F = F.at[:, 0:3, 0:3].set(I3)
        F = F.at[:, 0:3, 3:6].set(0.5 * d1 * k1)
        F = F.at[:, 0:3, 6:9].set(I3 * d1)
        F = F.at[:, 0:3, _BA:_BA + 3].set(-0.25 * (R0 + R1) * d1 ** 2)
        F = F.at[:, 0:3, _BG:_BG + 3].set(0.25 * (R1 @ Ra1) * d1 ** 3)
        F = F.at[:, 3:6, 3:6].set(k7)
        F = F.at[:, 3:6, _BG:_BG + 3].set(-I3 * d1)
        F = F.at[:, 6:9, 3:6].set(k1)
        F = F.at[:, 6:9, 6:9].set(I3)
        F = F.at[:, 6:9, _BA:_BA + 3].set(-0.5 * (R0 + R1) * d1)
        F = F.at[:, 6:9, _BG:_BG + 3].set(0.5 * (R1 @ Ra1) * d1 ** 2)
        d2 = dtv[:, None, None, None]
        R0l = R0[:, None]                                        # (T,1,3,3)
        R1l = R1[:, None]
        eps_R = (-0.5 * d2 * (R0l @ sv0)
                 - 0.5 * d2 * (R1l @ sv1) @ k7[:, None])         # (T,4,3,3)
        eps_BG = (0.5 * d2 ** 2 * (R1l @ sv1)
                  - 0.5 * d2 * (R0l @ sf0 + R1l @ sf1))
        eps_RHO = 0.5 * d2 * (g0 + g1)                           # (T,4,3,R)
        for j in range(C.NUM_OF_LEG):
            r = _EPS + 3 * j
            F = F.at[:, r:r + 3, 3:6].set(eps_R[:, j])
            F = F.at[:, r:r + 3, r:r + 3].set(I3)
            F = F.at[:, r:r + 3, _BG:_BG + 3].set(eps_BG[:, j])
            F = F.at[:, r:r + 3, _RHO + j:_RHO + j + 1].set(eps_RHO[:, j])
        F = F.at[:, _BA:_BA + 3, _BA:_BA + 3].set(I3)
        F = F.at[:, _BG:_BG + 3, _BG:_BG + 3].set(I3)
        F = F.at[:, _RHO:_RHO + 4, _RHO:_RHO + 4].set(jnp.eye(4, dtype=dtype))

        V = jnp.zeros((T, 31, 46), dtype)
        Vg = 0.25 * -(R1 @ Ra1) * d1 ** 2 * 0.5 * d1
        V = V.at[:, 0:3, 0:3].set(0.25 * R0 * d1 ** 2)
        V = V.at[:, 0:3, 3:6].set(Vg)
        V = V.at[:, 0:3, 6:9].set(0.25 * R1 * d1 ** 2)
        V = V.at[:, 0:3, 9:12].set(Vg)
        V = V.at[:, 3:6, 3:6].set(0.5 * I3 * d1)
        V = V.at[:, 3:6, 9:12].set(0.5 * I3 * d1)
        V = V.at[:, 6:9, 0:3].set(0.5 * R0 * d1)
        Vg2 = 0.5 * -(R1 @ Ra1) * d1 * 0.5 * d1
        V = V.at[:, 6:9, 3:6].set(Vg2)
        V = V.at[:, 6:9, 6:9].set(0.5 * R1 * d1)
        V = V.at[:, 6:9, 9:12].set(Vg2)
        eps_Gi = -0.25 * d2 ** 2 * (R1l @ sv1) + 0.5 * d2 * (R0l @ sf0)
        eps_Gi1 = -0.25 * d2 ** 2 * (R1l @ sv1) + 0.5 * d2 * (R1l @ sf1)
        eps_DPHI = -0.5 * d2 * jnp.einsum(
            "sij,jk,slkm->slim", R0, Rbr, kin["J"][:-1])
        eps_DPHI1 = -0.5 * d2 * jnp.einsum(
            "sij,jk,slkm->slim", R1, Rbr, kin["J"][1:])
        for j in range(C.NUM_OF_LEG):
            r = _EPS + 3 * j
            V = V.at[:, r:r + 3, C.ILNO_GI:C.ILNO_GI + 3].set(eps_Gi[:, j])
            V = V.at[:, r:r + 3, C.ILNO_GI1:C.ILNO_GI1 + 3].set(eps_Gi1[:, j])
            V = V.at[:, r:r + 3, C.ILNO_PHI:C.ILNO_PHI + 3].set(
                -0.5 * d2[:, 0] * h0[:, j])
            V = V.at[:, r:r + 3, C.ILNO_PHI1:C.ILNO_PHI1 + 3].set(
                -0.5 * d2[:, 0] * h1[:, j])
            V = V.at[:, r:r + 3, C.ILNO_DPHI:C.ILNO_DPHI + 3].set(
                eps_DPHI[:, j])
            V = V.at[:, r:r + 3, C.ILNO_DPHI1:C.ILNO_DPHI1 + 3].set(
                eps_DPHI1[:, j])
            V = V.at[:, r:r + 3, C.ILNO_V + 3 * j:C.ILNO_V + 3 * j + 3].set(
                -I3 * d1)
        V = V.at[:, _BA:_BA + 3, C.ILNO_BA:C.ILNO_BA + 3].set(-I3 * d1)
        V = V.at[:, _BG:_BG + 3, C.ILNO_BG:C.ILNO_BG + 3].set(-I3 * d1)
        V = V.at[:, _RHO:_RHO + 4, C.ILNO_NRHO:C.ILNO_NRHO + 4].set(
            -jnp.eye(4, dtype=dtype) * d1)

        an2, anz2, gn2 = params.acc_n ** 2, params.acc_n_z ** 2, \
            params.gyr_n ** 2
        base = jnp.concatenate([
            jnp.array([an2, an2, anz2, gn2, gn2, gn2,
                       an2, an2, anz2, gn2, gn2, gn2], dtype=dtype),
            jnp.full((3,), params.acc_w ** 2, dtype),
            jnp.full((3,), params.gyr_w ** 2, dtype),
            jnp.full((6,), params.phi_n ** 2, dtype),
            jnp.full((6,), params.dphi_n ** 2, dtype),
        ])
        noise = jnp.concatenate([
            jnp.broadcast_to(base, (T, 30)),
            uncertainties.reshape(T, 12), rho_uncertainty], axis=1)

        Q = jnp.einsum("tij,tj,tkj->tik", V, noise, V)

        # --- (F, Q) pairwise tree reduction ---
        M = 1 << (T - 1).bit_length() if T > 1 else 1
        padF = jnp.broadcast_to(jnp.eye(31, dtype=dtype), (M - T, 31, 31))
        padQ = jnp.zeros((M - T, 31, 31), dtype)
        Fs = jnp.concatenate([F, padF])
        Qs = jnp.concatenate([Q, padQ])
        while Fs.shape[0] > 1:
            F1, F2 = Fs[0::2], Fs[1::2]
            Q1, Q2 = Qs[0::2], Qs[1::2]
            Fs = F2 @ F1
            Qs = F2 @ Q1 @ jnp.swapaxes(F2, -1, -2) + Q2
        J, P = Fs[0], Qs[0]

    return ILPreint(
        dp=dp, dq=dq_pref[-1], dv=dv, deps=deps, sum_deps=sum_deps,
        J=J, P=P, sum_dt=jnp.sum(dtv), ba=ba, bg=bg, rho=rho,
        contact_flag=contact_final, integration_contact=int_contact,
        ff_min=ff_min, ff_max=ff_max, ff_window=ff_window, ff_idx=ff_idx,
    )


def il_residual(pre: ILPreint, state_i, state_j, gravity):
    """31-dim bias-corrected residual (reference: imu_leg_integration_base.cpp:845-898).

    state_{i,j}: dicts with p, q(wxyz), v, ba, bg (3-vecs) and rho (4,).
    """
    dba = state_i["ba"] - pre.ba
    dbg = state_i["bg"] - pre.bg
    drho = state_i["rho"] - pre.rho

    J = pre.J
    dp = pre.dp + J[0:3, _BA:_BA + 3] @ dba + J[0:3, _BG:_BG + 3] @ dbg
    dq = lie.quat_mul(pre.dq, lie.delta_q(J[3:6, _BG:_BG + 3] @ dbg))
    dv = pre.dv + J[6:9, _BA:_BA + 3] @ dba + J[6:9, _BG:_BG + 3] @ dbg

    qi_inv = lie.quat_conj(state_i["q"])
    r_p = lie.quat_rotate(
        qi_inv,
        0.5 * gravity * pre.sum_dt ** 2 + state_j["p"] - state_i["p"]
        - state_i["v"] * pre.sum_dt,
    ) - dp
    q_err = lie.quat_mul(lie.quat_conj(dq), lie.quat_mul(qi_inv, state_j["q"]))
    r_q = 2.0 * q_err[1:]
    r_v = lie.quat_rotate(qi_inv, gravity * pre.sum_dt + state_j["v"] - state_i["v"]) - dv

    rel_p = lie.quat_rotate(qi_inv, state_j["p"] - state_i["p"])
    r_eps = []
    for j in range(C.NUM_OF_LEG):
        r = _EPS + 3 * j
        deps_j = (pre.deps[j] + J[r:r + 3, _BG:_BG + 3] @ dbg
                  + J[r:r + 3, _RHO + j:_RHO + j + 1] @ drho[j:j + 1])
        r_eps.append(rel_p - deps_j)
    r_rho = state_j["rho"] - state_i["rho"]

    return jnp.concatenate(
        [r_p, r_q, r_v] + r_eps
        + [state_j["ba"] - state_i["ba"], state_j["bg"] - state_i["bg"], r_rho]
    )

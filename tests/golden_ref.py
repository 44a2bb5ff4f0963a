"""Golden transliteration of the reference preintegration recursion.

This module is a *literal, loop-by-loop NumPy port* of the reference C++:

  - 15-dim IMU preintegration:   /root/reference/src/factor/integration_base.h:65-198
  - 31-dim IMU+leg preintegration:
        /root/reference/src/factor/imu_leg_integration_base.cpp:62-469
        (contact models: :183-229, LO velocities :232-257, kron g/h terms
         :259-287, adaptive noise :288-358, noise layout :360-374 matching
         src/utils/parameters.h:135-172, F :376-430, V :432-465,
         J/P recursion :467-468, evaluate :845-898)
  - Leg kinematics: fk/jac/dfk_drho transcribed verbatim from
        /root/reference/src/legKinematics/A1Kinematics.cpp:43-120; the second
        derivatives dJ_dq / dJ_drho (A1Kinematics.cpp:122-220, MATLAB
        Symbolic Toolbox output) are re-derived with sympy from the SAME
        literal fk expressions and cross-pinned against the transcribed
        first derivatives (see test_golden_reference.py) — i.e. exactly what
        the Symbolic Toolbox generated, without hand-copying 120 lines of
        common-subexpression soup.

It exists so tests can assert element-wise agreement between the production
JAX implementation (cerberus_tpu/ops/preintegration.py) and an INDEPENDENT
reading of the reference semantics. It deliberately shares no code with the
package under test (pure NumPy + sympy; Eigen-convention quaternion helpers
reimplemented locally).

Quaternion semantics ("mode"):
  mode="eigen"  — literal Eigen behavior: Utility::deltaQ returns the
      UNNORMALIZED quaternion (1, th/2) (utility.h:28-38), the mid-step
      result_delta_q is used unnormalized for rotations / toRotationMatrix
      within the step, and delta_q.normalize() runs only at the end of
      propagate() (integration_base.h:165).
  mode="instep" — the production convention: deltaQ is normalized and the
      step quaternion is normalized before use. The two modes agree to
      ~O((|w| dt / 2)^2) per step; test_golden_reference.py both pins the
      production code to "instep" at ~1e-12 and bounds |eigen - instep|.
"""

from __future__ import annotations

import numpy as np
import sympy as sp

# ---------------------------------------------------------------------------
# Eigen-convention quaternions (w, x, y, z), plain NumPy
# ---------------------------------------------------------------------------


def q_identity():
    return np.array([1.0, 0.0, 0.0, 0.0])


def q_mul(q, p):
    """Hamilton product, Eigen Quaternion operator* semantics."""
    qw, qx, qy, qz = q
    pw, px, py, pz = p
    return np.array([
        qw * pw - qx * px - qy * py - qz * pz,
        qw * px + qx * pw + qy * pz - qz * py,
        qw * py - qx * pz + qy * pw + qz * px,
        qw * pz + qx * py - qy * px + qz * pw,
    ])


def q_transform(q, v):
    """Eigen Quaternion::_transformVector — the unit-assumption formula,
    applied verbatim even to non-unit quaternions (as Eigen does)."""
    vec = q[1:]
    uv = 2.0 * np.cross(vec, v)
    return v + q[0] * uv + np.cross(vec, uv)


def q_to_rot(q):
    """Eigen Quaternion::toRotationMatrix — unit-assumption formula."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def q_inverse(q):
    """Eigen Quaternion::inverse = conjugate / squaredNorm."""
    return q * np.array([1.0, -1.0, -1.0, -1.0]) / np.dot(q, q)


def q_normalized(q):
    return q / np.linalg.norm(q)


def skew(v):
    return np.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


def delta_q(theta, mode):
    """Utility::deltaQ (utility.h:28-38): q = (1, theta/2)."""
    q = np.array([1.0, theta[0] / 2.0, theta[1] / 2.0, theta[2] / 2.0])
    return q_normalized(q) if mode == "instep" else q


# ---------------------------------------------------------------------------
# Leg kinematics — literal transcription + sympy-derived exact derivatives
# ---------------------------------------------------------------------------


def fk_literal(q, lc, rho_fix):
    """autoFunc_fk_pf_pos, A1Kinematics.cpp:43-68, transcribed verbatim.
    rho_fix = [ox, oy, d, lu] (offset_x, offset_y, motor_offset, upper_len)."""
    ox, oy, d, lu = rho_fix
    t5, t6, t7 = np.cos(q[0]), np.cos(q[1]), np.cos(q[2])
    t8, t9, t10 = np.sin(q[0]), np.sin(q[1]), np.sin(q[2])
    p0 = (ox - lu * t9) - lc * np.sin(q[1] + q[2])
    p1 = (((oy + d * t5) + lu * t6 * t8) + lc * t6 * t7 * t8) - lc * t8 * t9 * t10
    tmp = lc * t5
    p2 = ((d * t8 - lu * t5 * t6) - tmp * t6 * t7) + tmp * t9 * t10
    return np.array([p0, p1, p2])


def jac_literal(q, lc, rho_fix):
    """autoFunc_d_fk_dt, A1Kinematics.cpp:70-107, transcribed verbatim.
    Output 3x3 built column-major from the flat jacobian[9] array."""
    ox, oy, d, lu = rho_fix
    t5, t6, t7 = np.cos(q[0]), np.cos(q[1]), np.cos(q[2])
    t8, t9, t10 = np.sin(q[0]), np.sin(q[1]), np.sin(q[2])
    t11s = q[1] + q[2]
    t16 = lc * np.sin(t11s)
    t11 = -(lc * np.cos(t11s))
    t18 = lu * t9 + t16
    out = np.empty(9)
    out[0] = 0.0
    tmp = lc * t5
    out[1] = ((-d * t8 + lu * t5 * t6) + tmp * t6 * t7) - tmp * t9 * t10
    tmp = lu * t6
    out[2] = ((d * t5 + tmp * t8) + lc * t6 * t7 * t8) - lc * t8 * t9 * t10
    out[3] = t11 - tmp  # note: tmp is lu*t6 here, exactly as in the C++
    out[4] = -t8 * t18
    out[5] = t5 * t18
    out[6] = t11
    out[7] = -t8 * t16
    out[8] = t5 * t16
    return out.reshape(3, 3, order="F")


def dfk_drho_literal(q, lc, rho_fix):
    """autoFunc_d_fk_drho, A1Kinematics.cpp:109-120, transcribed verbatim."""
    t5 = q[1] + q[2]
    t6 = np.cos(t5)
    return np.array([-np.sin(t5), t6 * np.sin(q[0]), -t6 * np.cos(q[0])])


def _build_sympy_kinematics():
    """Exact analytic derivatives of the literal fk, via sympy.

    Layout convention for the 9-row outputs (dJ_dq 9x3, dJ_drho 9x1): row
    3*m + i holds d J[i, m] / d(...), i.e. the column-major flattening Eigen
    uses for Matrix<double, 9, 3>.data() (A1Kinematics.cpp:122-220) and that
    the kron contraction in imu_leg_integration_base.cpp:266-286 assumes.
    """
    q0, q1, q2, lc, ox, oy, d, lu = sp.symbols("q0 q1 q2 lc ox oy d lu")
    fk = sp.Matrix([
        (ox - lu * sp.sin(q1)) - lc * sp.sin(q1 + q2),
        (oy + d * sp.cos(q0) + lu * sp.cos(q1) * sp.sin(q0)
         + lc * sp.cos(q1) * sp.cos(q2) * sp.sin(q0)
         - lc * sp.sin(q0) * sp.sin(q1) * sp.sin(q2)),
        (d * sp.sin(q0) - lu * sp.cos(q0) * sp.cos(q1)
         - lc * sp.cos(q0) * sp.cos(q1) * sp.cos(q2)
         + lc * sp.cos(q0) * sp.sin(q1) * sp.sin(q2)),
    ])
    qs = [q0, q1, q2]
    J = fk.jacobian(qs)                       # 3x3
    dfk_drho = fk.diff(lc)                    # 3x1
    # row 3m+i = d J[i, m] / d q_k   (column-major J flattening)
    dJ_dq = sp.Matrix(9, 3, lambda r, k: J[r % 3, r // 3].diff(qs[k]))
    dJ_drho = sp.Matrix(9, 1, lambda r, _: J[r % 3, r // 3].diff(lc))
    args = (q0, q1, q2, lc, ox, oy, d, lu)
    lam = lambda expr: sp.lambdify(args, expr, modules="numpy")
    return {
        "fk": lam(fk), "jac": lam(J), "dfk_drho": lam(dfk_drho),
        "dJ_dq": lam(dJ_dq), "dJ_drho": lam(dJ_drho),
    }


_SYM = _build_sympy_kinematics()


class GoldenKinematics:
    """A1Kinematics equivalent: literal fk + exact symbolic derivatives."""

    @staticmethod
    def fk(q, rho_opt, rho_fix):
        return np.asarray(_SYM["fk"](q[0], q[1], q[2], rho_opt[0], *rho_fix),
                          dtype=float).reshape(3)

    @staticmethod
    def jac(q, rho_opt, rho_fix):
        return np.asarray(_SYM["jac"](q[0], q[1], q[2], rho_opt[0], *rho_fix),
                          dtype=float).reshape(3, 3)

    @staticmethod
    def dfk_drho(q, rho_opt, rho_fix):
        return np.asarray(
            _SYM["dfk_drho"](q[0], q[1], q[2], rho_opt[0], *rho_fix),
            dtype=float).reshape(3, 1)

    @staticmethod
    def dJ_dq(q, rho_opt, rho_fix):
        return np.asarray(_SYM["dJ_dq"](q[0], q[1], q[2], rho_opt[0], *rho_fix),
                          dtype=float).reshape(9, 3)

    @staticmethod
    def dJ_drho(q, rho_opt, rho_fix):
        return np.asarray(
            _SYM["dJ_drho"](q[0], q[1], q[2], rho_opt[0], *rho_fix),
            dtype=float).reshape(9, 1)


# ---------------------------------------------------------------------------
# 15-dim IMU preintegration — integration_base.h:18-222, literal port
# ---------------------------------------------------------------------------


class GoldenIntegrationBase:
    """Literal port of IntegrationBase (integration_base.h).

    Noise: the reference's 15-dim class uses isotropic ACC_N for all three
    accel axes (integration_base.h:32-35); acc_n_z is accepted here only so
    the production generalization (which reuses the 31-dim ACC_N_Z
    convention, parameters.h:135-141) can be compared like-for-like.
    """

    def __init__(self, acc_0, gyr_0, ba, bg, acc_n, gyr_n, acc_w, gyr_w,
                 acc_n_z=None, mode="eigen"):
        self.mode = mode
        self.acc_0 = np.array(acc_0, float)
        self.gyr_0 = np.array(gyr_0, float)
        self.linearized_acc = self.acc_0.copy()
        self.linearized_gyr = self.gyr_0.copy()
        self.linearized_ba = np.array(ba, float)
        self.linearized_bg = np.array(bg, float)
        self.jacobian = np.eye(15)
        self.covariance = np.zeros((15, 15))
        self.sum_dt = 0.0
        self.delta_p = np.zeros(3)
        self.delta_q = q_identity()
        self.delta_v = np.zeros(3)
        anz = acc_n if acc_n_z is None else acc_n_z
        self.noise = np.zeros((18, 18))
        self.noise[0:3, 0:3] = np.diag([acc_n**2, acc_n**2, anz**2])
        self.noise[3:6, 3:6] = gyr_n**2 * np.eye(3)
        self.noise[6:9, 6:9] = np.diag([acc_n**2, acc_n**2, anz**2])
        self.noise[9:12, 9:12] = gyr_n**2 * np.eye(3)
        self.noise[12:15, 12:15] = acc_w**2 * np.eye(3)
        self.noise[15:18, 15:18] = gyr_w**2 * np.eye(3)
        self.dt_buf, self.acc_buf, self.gyr_buf = [], [], []

    def push_back(self, dt, acc, gyr):
        self.dt_buf.append(dt)
        self.acc_buf.append(np.array(acc, float))
        self.gyr_buf.append(np.array(gyr, float))
        self.propagate(dt, acc, gyr)

    def repropagate(self, ba, bg):
        """integration_base.h:49-63."""
        self.sum_dt = 0.0
        self.acc_0 = self.linearized_acc.copy()
        self.gyr_0 = self.linearized_gyr.copy()
        self.delta_p = np.zeros(3)
        self.delta_q = q_identity()
        self.delta_v = np.zeros(3)
        self.linearized_ba = np.array(ba, float)
        self.linearized_bg = np.array(bg, float)
        self.jacobian = np.eye(15)
        self.covariance = np.zeros((15, 15))
        for dt, a, g in zip(self.dt_buf, self.acc_buf, self.gyr_buf):
            self.propagate(dt, a, g)

    def mid_point_integration(self, _dt, _acc_0, _gyr_0, _acc_1, _gyr_1):
        """integration_base.h:65-140, update_jacobian always true."""
        ba, bg = self.linearized_ba, self.linearized_bg
        un_acc_0 = q_transform(self.delta_q, _acc_0 - ba)
        un_gyr = 0.5 * (_gyr_0 + _gyr_1) - bg
        result_delta_q = q_mul(self.delta_q, delta_q(un_gyr * _dt, self.mode))
        if self.mode == "instep":
            result_delta_q = q_normalized(result_delta_q)
        un_acc_1 = q_transform(result_delta_q, _acc_1 - ba)
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        result_delta_p = self.delta_p + self.delta_v * _dt + 0.5 * un_acc * _dt**2
        result_delta_v = self.delta_v + un_acc * _dt

        R_w_x = skew(un_gyr)
        R_a_0_x = skew(_acc_0 - ba)
        R_a_1_x = skew(_acc_1 - ba)
        R0 = q_to_rot(self.delta_q)
        R1 = q_to_rot(result_delta_q)
        I3 = np.eye(3)

        F = np.zeros((15, 15))
        F[0:3, 0:3] = I3
        F[0:3, 3:6] = (-0.25 * R0 @ R_a_0_x * _dt**2
                       - 0.25 * R1 @ R_a_1_x @ (I3 - R_w_x * _dt) * _dt**2)
        F[0:3, 6:9] = I3 * _dt
        F[0:3, 9:12] = -0.25 * (R0 + R1) * _dt**2
        F[0:3, 12:15] = -0.25 * R1 @ R_a_1_x * _dt**2 * -_dt
        F[3:6, 3:6] = I3 - R_w_x * _dt
        F[3:6, 12:15] = -I3 * _dt
        F[6:9, 3:6] = (-0.5 * R0 @ R_a_0_x * _dt
                       - 0.5 * R1 @ R_a_1_x @ (I3 - R_w_x * _dt) * _dt)
        F[6:9, 6:9] = I3
        F[6:9, 9:12] = -0.5 * (R0 + R1) * _dt
        F[6:9, 12:15] = -0.5 * R1 @ R_a_1_x * _dt * -_dt
        F[9:12, 9:12] = I3
        F[12:15, 12:15] = I3

        V = np.zeros((15, 18))
        V[0:3, 0:3] = 0.25 * R0 * _dt**2
        V[0:3, 3:6] = 0.25 * -R1 @ R_a_1_x * _dt**2 * 0.5 * _dt
        V[0:3, 6:9] = 0.25 * R1 * _dt**2
        V[0:3, 9:12] = V[0:3, 3:6]
        V[3:6, 3:6] = 0.5 * I3 * _dt
        V[3:6, 9:12] = 0.5 * I3 * _dt
        V[6:9, 0:3] = 0.5 * R0 * _dt
        V[6:9, 3:6] = 0.5 * -R1 @ R_a_1_x * _dt * 0.5 * _dt
        V[6:9, 6:9] = 0.5 * R1 * _dt
        V[6:9, 9:12] = V[6:9, 3:6]
        V[9:12, 12:15] = I3 * _dt
        V[12:15, 15:18] = I3 * _dt

        self.jacobian = F @ self.jacobian
        self.covariance = F @ self.covariance @ F.T + V @ self.noise @ V.T
        return result_delta_p, result_delta_q, result_delta_v

    def propagate(self, _dt, _acc_1, _gyr_1):
        """integration_base.h:142-170."""
        _acc_1 = np.array(_acc_1, float)
        _gyr_1 = np.array(_gyr_1, float)
        p, q, v = self.mid_point_integration(_dt, self.acc_0, self.gyr_0,
                                             _acc_1, _gyr_1)
        self.delta_p, self.delta_q, self.delta_v = p, q, v
        self.delta_q = q_normalized(self.delta_q)
        self.sum_dt += _dt
        self.acc_0, self.gyr_0 = _acc_1, _gyr_1

    def evaluate(self, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, G):
        """integration_base.h:172-198. Quaternions wxyz; G is the gravity
        vector (reference: parameters.cpp `G` = (0, 0, 9.81-ish))."""
        J = self.jacobian
        dba = Bai - self.linearized_ba
        dbg = Bgi - self.linearized_bg
        corrected_delta_q = q_mul(self.delta_q,
                                  delta_q(J[3:6, 12:15] @ dbg, self.mode))
        corrected_delta_v = self.delta_v + J[6:9, 9:12] @ dba + J[6:9, 12:15] @ dbg
        corrected_delta_p = self.delta_p + J[0:3, 9:12] @ dba + J[0:3, 12:15] @ dbg
        r = np.zeros(15)
        Qi_inv = q_inverse(Qi)
        r[0:3] = q_transform(Qi_inv, 0.5 * G * self.sum_dt**2 + Pj - Pi
                             - Vi * self.sum_dt) - corrected_delta_p
        r[3:6] = 2.0 * q_mul(q_inverse(corrected_delta_q),
                             q_mul(Qi_inv, Qj))[1:]
        r[6:9] = q_transform(Qi_inv, G * self.sum_dt + Vj - Vi) - corrected_delta_v
        r[9:12] = Baj - Bai
        r[12:15] = Bgj - Bgi
        return r


# ---------------------------------------------------------------------------
# 31-dim IMU+leg preintegration — imu_leg_integration_base.cpp, literal port
# ---------------------------------------------------------------------------

NUM_OF_LEG = 4
RHO_OPT_SIZE = 1
FOOT_VAR_WINDOW_SIZE = 5  # imu_leg_integration_base.h:20

# error-state / noise index enums, parameters.h:118-172
ILO_P, ILO_R, ILO_V = 0, 3, 6
ILO_EPS1 = 9
ILO_BA, ILO_BG = 21, 24
ILO_RHO1 = 27
ILNO_Ai, ILNO_Gi, ILNO_Ai1, ILNO_Gi1 = 0, 3, 6, 9
ILNO_BA, ILNO_BG = 12, 15
ILNO_PHIi, ILNO_PHIi1, ILNO_DPHIi, ILNO_DPHIi1 = 18, 21, 24, 27
ILNO_V1 = 30
ILNO_NRHO1 = 42


class GoldenILParams:
    """Noise densities + geometry, mirroring the reference globals
    (parameters.h:27-89) consumed by imu_leg_integration_base.cpp."""

    def __init__(self, *, acc_n, acc_n_z, gyr_n, acc_w, gyr_w, phi_n, dphi_n,
                 rho_c_n, rho_nc_n, v_n_min_xy, v_n_min_z, v_n_min, v_n_max,
                 v_n_force_thres_ratio, v_n_term1_steep, v_n_term2_var_rescale,
                 v_n_term3_distance_rescale, contact_sensor_type,
                 rho_fix_list, p_br, R_br):
        self.__dict__.update(locals())
        del self.self


class GoldenIMULegIntegrationBase:
    """Literal port of IMULegIntegrationBase (imu_leg_integration_base.cpp).

    `ff_init` mirrors the production code's cross-interval threading of the
    adaptive foot-force tracker; the reference cold-starts these per object
    (imu_leg_integration_base.cpp:29-30 via foot_force_min/max.setZero()),
    which is the default here.
    """

    def __init__(self, acc_0, gyr_0, phi_0, dphi_0, c_0, ba, bg, rho,
                 params: GoldenILParams, mode="eigen", ff_init=None):
        self.p = params
        self.mode = mode
        self.acc_0 = np.array(acc_0, float)
        self.gyr_0 = np.array(gyr_0, float)
        self.phi_0 = np.array(phi_0, float)
        self.dphi_0 = np.array(dphi_0, float)
        self.c_0 = np.array(c_0, float)
        self.linearized_acc = self.acc_0.copy()
        self.linearized_gyr = self.gyr_0.copy()
        self.linearized_phi = self.phi_0.copy()
        self.linearized_dphi = self.dphi_0.copy()
        self.linearized_c = self.c_0.copy()
        self.linearized_ba = np.array(ba, float)
        self.linearized_bg = np.array(bg, float)
        self.linearized_rho = np.array(rho, float)
        self.jacobian = np.eye(31)
        self.covariance = np.zeros((31, 31))
        self.sum_dt = 0.0
        self.delta_p = np.zeros(3)
        self.delta_q = q_identity()
        self.delta_v = np.zeros(3)
        self.delta_epsilon = [np.zeros(3) for _ in range(NUM_OF_LEG)]
        self.sum_delta_epsilon = np.zeros(3)
        self.integration_contact_flag = [True] * NUM_OF_LEG
        self.foot_contact_flag = np.zeros(NUM_OF_LEG)
        if ff_init is None:
            self.foot_force_min = np.zeros(NUM_OF_LEG)
            self.foot_force_max = np.zeros(NUM_OF_LEG)
            self.foot_force_window = np.zeros((NUM_OF_LEG, FOOT_VAR_WINDOW_SIZE))
            self.foot_force_window_idx = np.zeros(NUM_OF_LEG, int)
        else:
            self.foot_force_min = np.array(ff_init[0], float)
            self.foot_force_max = np.array(ff_init[1], float)
            self.foot_force_window = np.array(ff_init[2], float)
            self.foot_force_window_idx = np.array(ff_init[3], int)
        self.foot_force_contact_threshold = np.zeros(NUM_OF_LEG)
        self.foot_force_var = np.zeros(NUM_OF_LEG)
        self.noise_diag = np.zeros(46)
        self.step_F = []     # recorded per step, for block-level comparison
        self.step_V = []
        self.step_noise = []
        self.buf = []

    def push_back(self, dt, acc, gyr, phi, dphi, c):
        self.buf.append((dt, np.array(acc, float), np.array(gyr, float),
                         np.array(phi, float), np.array(dphi, float),
                         np.array(c, float)))
        self.propagate(*self.buf[-1])

    def repropagate(self, ba, bg, rho):
        """imu_leg_integration_base.cpp repropagate: reset to the
        linearization sample and re-run all buffered measurements."""
        self.sum_dt = 0.0
        self.acc_0 = self.linearized_acc.copy()
        self.gyr_0 = self.linearized_gyr.copy()
        self.phi_0 = self.linearized_phi.copy()
        self.dphi_0 = self.linearized_dphi.copy()
        self.c_0 = self.linearized_c.copy()
        self.delta_p = np.zeros(3)
        self.delta_q = q_identity()
        self.delta_v = np.zeros(3)
        self.delta_epsilon = [np.zeros(3) for _ in range(NUM_OF_LEG)]
        self.sum_delta_epsilon = np.zeros(3)
        self.linearized_ba = np.array(ba, float)
        self.linearized_bg = np.array(bg, float)
        self.linearized_rho = np.array(rho, float)
        self.jacobian = np.eye(31)
        self.covariance = np.zeros((31, 31))
        self.step_F, self.step_V, self.step_noise = [], [], []
        buf, self.buf = self.buf, []
        for m in buf:
            self.push_back(*m)

    def propagate(self, _dt, _acc_1, _gyr_1, _phi_1, _dphi_1, _c_1):
        """imu_leg_integration_base.cpp:96-136."""
        res = self.mid_point_integration(_dt, self.acc_0, self.gyr_0, _acc_1,
                                         _gyr_1, self.phi_0, self.dphi_0,
                                         self.c_0, _phi_1, _dphi_1, _c_1)
        (self.delta_p, self.delta_q, self.delta_v, self.delta_epsilon,
         self.sum_delta_epsilon) = res
        self.delta_q = q_normalized(self.delta_q)
        self.sum_dt += _dt
        self.acc_0, self.gyr_0 = _acc_1, _gyr_1
        self.phi_0, self.dphi_0, self.c_0 = _phi_1, _dphi_1, _c_1

    def mid_point_integration(self, _dt, _acc_0, _gyr_0, _acc_1, _gyr_1,
                              _phi_0, _dphi_0, _c_0, _phi_1, _dphi_1, _c_1):
        """imu_leg_integration_base.cpp:138-469, update_jacobian always on."""
        P = self.p
        ba, bg = self.linearized_ba, self.linearized_bg
        rho = self.linearized_rho
        kin = GoldenKinematics

        un_acc_0 = q_transform(self.delta_q, _acc_0 - ba)
        un_gyr = 0.5 * (_gyr_0 + _gyr_1) - bg
        result_delta_q = q_mul(self.delta_q, delta_q(un_gyr * _dt, self.mode))
        if self.mode == "instep":
            result_delta_q = q_normalized(result_delta_q)
        un_acc_1 = q_transform(result_delta_q, _acc_1 - ba)
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        result_delta_p = self.delta_p + self.delta_v * _dt + 0.5 * un_acc * _dt**2
        result_delta_v = self.delta_v + un_acc * _dt

        w_0_x = _gyr_0 - bg
        w_1_x = _gyr_1 - bg
        R_w_0_x = skew(w_0_x)
        R_w_1_x = skew(w_1_x)

        # contact flag + foot-force statistics (:183-229)
        if P.contact_sensor_type in (0, 1):
            for j in range(NUM_OF_LEG):
                self.foot_contact_flag[j] = 1.0 if _c_1[j] >= 0.5 else 0.0
                if self.foot_contact_flag[j] < 0.5:
                    self.integration_contact_flag[j] = False
        elif P.contact_sensor_type == 2:
            for j in range(NUM_OF_LEG):
                force_mag = 0.5 * (_c_0[j] + _c_1[j])
                if force_mag < self.foot_force_min[j]:
                    self.foot_force_min[j] = (0.9 * self.foot_force_min[j]
                                              + 0.1 * force_mag)
                if force_mag > self.foot_force_max[j]:
                    self.foot_force_max[j] = (0.9 * self.foot_force_max[j]
                                              + 0.1 * force_mag)
                self.foot_force_min[j] *= 0.9991
                self.foot_force_max[j] *= 0.997
                self.foot_force_contact_threshold[j] = (
                    self.foot_force_min[j] + P.v_n_force_thres_ratio
                    * (self.foot_force_max[j] - self.foot_force_min[j]))
                self.foot_contact_flag[j] = 1.0 / (1.0 + np.exp(
                    -P.v_n_term1_steep
                    * (force_mag - self.foot_force_contact_threshold[j])))
                self.foot_force_window_idx[j] += 1
                self.foot_force_window_idx[j] %= FOOT_VAR_WINDOW_SIZE
                self.foot_force_window[j, self.foot_force_window_idx[j]] = force_mag
                ys = self.foot_force_window[j]
                self.foot_force_var[j] = np.sum((ys - ys.mean())**2) / (len(ys) - 1)
                if self.foot_contact_flag[j] < 0.5:
                    self.integration_contact_flag[j] = False

        # per-leg velocity measurement (:232-257)
        fi, fip1, Ji, Jip1, vi, vip1 = [], [], [], [], [], []
        result_delta_epsilon = [None] * NUM_OF_LEG
        for j in range(NUM_OF_LEG):
            rho_j = rho[j * RHO_OPT_SIZE:(j + 1) * RHO_OPT_SIZE]
            rf = P.rho_fix_list[j]
            fi.append(kin.fk(_phi_0[3 * j:3 * j + 3], rho_j, rf))
            fip1.append(kin.fk(_phi_1[3 * j:3 * j + 3], rho_j, rf))
            Ji.append(kin.jac(_phi_0[3 * j:3 * j + 3], rho_j, rf))
            Jip1.append(kin.jac(_phi_1[3 * j:3 * j + 3], rho_j, rf))
            vi.append(-P.R_br @ Ji[j] @ _dphi_0[3 * j:3 * j + 3]
                      - R_w_0_x @ (P.p_br + P.R_br @ fi[j]))
            vip1.append(-P.R_br @ Jip1[j] @ _dphi_1[3 * j:3 * j + 3]
                        - R_w_1_x @ (P.p_br + P.R_br @ fip1[j]))
            result_delta_epsilon[j] = self.delta_epsilon[j] + 0.5 * (
                q_transform(self.delta_q, vi[j])
                + q_transform(result_delta_q, vip1[j])) * _dt

        lo_velocities = np.zeros((3, NUM_OF_LEG))
        for j in range(NUM_OF_LEG):
            lo_velocities[:, j] = 0.5 * (q_transform(self.delta_q, vi[j])
                                         + q_transform(result_delta_q, vip1[j]))

        # kron g/h terms (:259-287)
        gi, gip1, hi, hip1, dfdrhoi, dfdrhoip1 = [], [], [], [], [], []
        Rdq = q_to_rot(self.delta_q)
        Rdq1 = q_to_rot(result_delta_q)
        for j in range(NUM_OF_LEG):
            rho_j = rho[j * RHO_OPT_SIZE:(j + 1) * RHO_OPT_SIZE]
            rf = P.rho_fix_list[j]
            dfdrhoi.append(kin.dfk_drho(_phi_0[3 * j:3 * j + 3], rho_j, rf))
            dfdrhoip1.append(kin.dfk_drho(_phi_1[3 * j:3 * j + 3], rho_j, rf))
            dJdrho0 = kin.dJ_drho(_phi_0[3 * j:3 * j + 3], rho_j, rf)
            kron_dphi0 = np.zeros((3, 9))
            for m in range(3):
                for i in range(3):
                    kron_dphi0[i, 3 * m + i] = _dphi_0[m + 3 * j]
            gi.append(-Rdq @ (P.R_br @ kron_dphi0 @ dJdrho0
                              + R_w_0_x @ P.R_br @ dfdrhoi[j]))
            dJdrho1 = kin.dJ_drho(_phi_1[3 * j:3 * j + 3], rho_j, rf)
            kron_dphi1 = np.zeros((3, 9))
            for m in range(3):
                for i in range(3):
                    kron_dphi1[i, 3 * m + i] = _dphi_1[m + 3 * j]
            gip1.append(-Rdq1 @ (P.R_br @ kron_dphi1 @ dJdrho1
                                 + R_w_1_x @ P.R_br @ dfdrhoip1[j]))
            dJdphi0 = kin.dJ_dq(_phi_0[3 * j:3 * j + 3], rho_j, rf)
            hi.append(Rdq @ (P.R_br @ kron_dphi0 @ dJdphi0
                             + R_w_0_x @ P.R_br @ Ji[j]))
            dJdphi1 = kin.dJ_dq(_phi_1[3 * j:3 * j + 3], rho_j, rf)
            hip1.append(Rdq1 @ (P.R_br @ kron_dphi1 @ dJdphi1
                                + R_w_1_x @ P.R_br @ Jip1[j]))

        # adaptive per-leg measurement noise (:288-317)
        uncertainties = np.zeros(12)
        if P.contact_sensor_type in (0, 1):
            for j in range(NUM_OF_LEG):
                c = self.foot_contact_flag[j]
                n_xy = P.v_n_max * (1 - c) + c * P.v_n_min_xy
                n_z = P.v_n_max * (1 - c) + c * P.v_n_min_z
                uncertainties[3 * j:3 * j + 3] = [n_xy, n_xy, n_z]
        elif P.contact_sensor_type == 2:
            for j in range(NUM_OF_LEG):
                n1 = P.v_n_max * (1 - self.foot_contact_flag[j]) + P.v_n_min
                n2 = P.v_n_term2_var_rescale * self.foot_force_var[j]
                tmp = lo_velocities[:, j] - self.delta_v
                n3 = P.v_n_term3_distance_rescale * tmp**2
                uncertainties[3 * j:3 * j + 3] = n1 + n2 + n3

        rho_uncertainty = np.array([
            P.rho_c_n * self.foot_contact_flag[j] + P.rho_nc_n
            for j in range(NUM_OF_LEG)])

        # uncertainty-weighted LO fusion (:325-351)
        average_delta_epsilon = np.zeros(3)
        average_count = np.zeros(3)
        for j in range(NUM_OF_LEG):
            weight = ((P.v_n_max + P.v_n_term2_var_rescale
                       + P.v_n_term3_distance_rescale)
                      / uncertainties[3 * j:3 * j + 3])
            weight = np.maximum(weight, 0.001)
            average_delta_epsilon += weight * lo_velocities[:, j] * _dt
            average_count += weight
        average_delta_epsilon /= average_count
        result_sum_delta_epsilon = self.sum_delta_epsilon + average_delta_epsilon

        # all-feet airborne (:353-358)
        if self.foot_contact_flag.sum() < 1e-6:
            rho_uncertainty[:] = P.rho_nc_n
            uncertainties[:] = 10e10

        # noise diagonal, parameters.h:135-172 layout (:360-374)
        nd = self.noise_diag
        nd[0:3] = [P.acc_n**2, P.acc_n**2, P.acc_n_z**2]
        nd[3:6] = P.gyr_n**2
        nd[6:9] = [P.acc_n**2, P.acc_n**2, P.acc_n_z**2]
        nd[9:12] = P.gyr_n**2
        nd[12:15] = P.acc_w**2
        nd[15:18] = P.gyr_w**2
        nd[18:24] = P.phi_n**2
        nd[24:30] = P.dphi_n**2
        nd[30:42] = uncertainties
        nd[42:46] = rho_uncertainty

        # F (:376-430) and V (:432-465)
        w_x = 0.5 * (_gyr_0 + _gyr_1) - bg
        a_0_x = _acc_0 - ba
        a_1_x = _acc_1 - ba
        R_w_x, R_a_0_x, R_a_1_x = skew(w_x), skew(a_0_x), skew(a_1_x)
        I3 = np.eye(3)
        kappa_7 = I3 - R_w_x * _dt

        F = np.zeros((31, 31))
        F[ILO_P:ILO_P + 3, ILO_P:ILO_P + 3] = I3
        kappa_1 = (-0.5 * Rdq @ R_a_0_x * _dt
                   - 0.5 * Rdq1 @ R_a_1_x @ kappa_7 * _dt)
        F[ILO_P:ILO_P + 3, ILO_R:ILO_R + 3] = 0.5 * _dt * kappa_1
        F[ILO_P:ILO_P + 3, ILO_V:ILO_V + 3] = I3 * _dt
        F[ILO_P:ILO_P + 3, ILO_BA:ILO_BA + 3] = -0.25 * (Rdq + Rdq1) * _dt**2
        F[ILO_P:ILO_P + 3, ILO_BG:ILO_BG + 3] = 0.25 * Rdq1 @ R_a_1_x * _dt**3
        F[ILO_R:ILO_R + 3, ILO_R:ILO_R + 3] = kappa_7
        F[ILO_R:ILO_R + 3, ILO_BG:ILO_BG + 3] = -I3 * _dt
        F[ILO_V:ILO_V + 3, ILO_R:ILO_R + 3] = kappa_1
        F[ILO_V:ILO_V + 3, ILO_V:ILO_V + 3] = I3
        F[ILO_V:ILO_V + 3, ILO_BA:ILO_BA + 3] = -0.5 * (Rdq + Rdq1) * _dt
        F[ILO_V:ILO_V + 3, ILO_BG:ILO_BG + 3] = 0.5 * Rdq1 @ R_a_1_x * _dt**2
        for j in range(NUM_OF_LEG):
            r = ILO_EPS1 + 3 * j
            F[r:r + 3, ILO_R:ILO_R + 3] = (
                -0.5 * _dt * Rdq @ skew(vi[j])
                - 0.5 * _dt * Rdq1 @ skew(vip1[j]) @ kappa_7)
            F[r:r + 3, r:r + 3] = I3
            F[r:r + 3, ILO_BG:ILO_BG + 3] = (
                0.5 * _dt**2 * Rdq1 @ skew(vip1[j])
                - 0.5 * _dt * (Rdq @ skew(P.p_br + P.R_br @ fi[j])
                               + Rdq1 @ skew(P.p_br + P.R_br @ fip1[j])))
            F[r:r + 3, ILO_RHO1 + j:ILO_RHO1 + j + 1] = (
                0.5 * _dt * (gi[j] + gip1[j]))
        F[ILO_BA:ILO_BA + 3, ILO_BA:ILO_BA + 3] = I3
        F[ILO_BG:ILO_BG + 3, ILO_BG:ILO_BG + 3] = I3
        F[ILO_RHO1:ILO_RHO1 + 4, ILO_RHO1:ILO_RHO1 + 4] = np.eye(4)

        V = np.zeros((31, 46))
        V[ILO_P:ILO_P + 3, ILNO_Ai:ILNO_Ai + 3] = 0.25 * Rdq * _dt**2
        V[ILO_P:ILO_P + 3, ILNO_Gi:ILNO_Gi + 3] = (
            0.25 * -Rdq1 @ R_a_1_x * _dt**2 * 0.5 * _dt)
        V[ILO_P:ILO_P + 3, ILNO_Ai1:ILNO_Ai1 + 3] = 0.25 * Rdq1 * _dt**2
        V[ILO_P:ILO_P + 3, ILNO_Gi1:ILNO_Gi1 + 3] = \
            V[ILO_P:ILO_P + 3, ILNO_Gi:ILNO_Gi + 3]
        V[ILO_R:ILO_R + 3, ILNO_Gi:ILNO_Gi + 3] = 0.5 * I3 * _dt
        V[ILO_R:ILO_R + 3, ILNO_Gi1:ILNO_Gi1 + 3] = 0.5 * I3 * _dt
        V[ILO_V:ILO_V + 3, ILNO_Ai:ILNO_Ai + 3] = 0.5 * Rdq * _dt
        V[ILO_V:ILO_V + 3, ILNO_Gi:ILNO_Gi + 3] = (
            0.5 * -Rdq1 @ R_a_1_x * _dt * 0.5 * _dt)
        V[ILO_V:ILO_V + 3, ILNO_Ai1:ILNO_Ai1 + 3] = 0.5 * Rdq1 * _dt
        V[ILO_V:ILO_V + 3, ILNO_Gi1:ILNO_Gi1 + 3] = \
            V[ILO_V:ILO_V + 3, ILNO_Gi:ILNO_Gi + 3]
        for j in range(NUM_OF_LEG):
            r = ILO_EPS1 + 3 * j
            V[r:r + 3, ILNO_Gi:ILNO_Gi + 3] = (
                -0.25 * _dt**2 * Rdq1 @ skew(vip1[j])
                + 0.5 * _dt * Rdq @ skew(P.p_br + P.R_br @ fi[j]))
            V[r:r + 3, ILNO_Gi1:ILNO_Gi1 + 3] = (
                -0.25 * _dt**2 * Rdq1 @ skew(vip1[j])
                + 0.5 * _dt * Rdq1 @ skew(P.p_br + P.R_br @ fip1[j]))
            V[r:r + 3, ILNO_PHIi:ILNO_PHIi + 3] = -0.5 * _dt * hi[j]
            V[r:r + 3, ILNO_PHIi1:ILNO_PHIi1 + 3] = -0.5 * _dt * hip1[j]
            V[r:r + 3, ILNO_DPHIi:ILNO_DPHIi + 3] = (
                -0.5 * _dt * Rdq @ P.R_br @ Ji[j])
            V[r:r + 3, ILNO_DPHIi1:ILNO_DPHIi1 + 3] = (
                -0.5 * _dt * Rdq1 @ P.R_br @ Jip1[j])
            V[r:r + 3, ILNO_V1 + 3 * j:ILNO_V1 + 3 * j + 3] = -I3 * _dt
        V[ILO_BA:ILO_BA + 3, ILNO_BA:ILNO_BA + 3] = -I3 * _dt
        V[ILO_BG:ILO_BG + 3, ILNO_BG:ILNO_BG + 3] = -I3 * _dt
        V[ILO_RHO1:ILO_RHO1 + 4, ILNO_NRHO1:ILNO_NRHO1 + 4] = -np.eye(4) * _dt

        self.step_F.append(F.copy())
        self.step_V.append(V.copy())
        self.step_noise.append(nd.copy())
        self.jacobian = F @ self.jacobian
        self.covariance = (F @ self.covariance @ F.T
                           + V @ np.diag(nd) @ V.T)
        return (result_delta_p, result_delta_q, result_delta_v,
                result_delta_epsilon, result_sum_delta_epsilon)

    def evaluate(self, Pi, Qi, Vi, Bai, Bgi, rhoi, Pj, Qj, Vj, Baj, Bgj, rhoj,
                 G):
        """imu_leg_integration_base.cpp:845-898."""
        J = self.jacobian
        dba = Bai - self.linearized_ba
        dbg = Bgi - self.linearized_bg
        drho = rhoi - self.linearized_rho
        corrected_delta_q = q_mul(self.delta_q,
                                  delta_q(J[ILO_R:ILO_R + 3,
                                            ILO_BG:ILO_BG + 3] @ dbg, self.mode))
        corrected_delta_v = (self.delta_v
                             + J[ILO_V:ILO_V + 3, ILO_BA:ILO_BA + 3] @ dba
                             + J[ILO_V:ILO_V + 3, ILO_BG:ILO_BG + 3] @ dbg)
        corrected_delta_p = (self.delta_p
                             + J[ILO_P:ILO_P + 3, ILO_BA:ILO_BA + 3] @ dba
                             + J[ILO_P:ILO_P + 3, ILO_BG:ILO_BG + 3] @ dbg)
        corrected_delta_epsilon = []
        for j in range(NUM_OF_LEG):
            r = ILO_EPS1 + 3 * j
            corrected_delta_epsilon.append(
                self.delta_epsilon[j]
                + J[r:r + 3, ILO_BG:ILO_BG + 3] @ dbg
                + J[r:r + 3, ILO_RHO1 + j:ILO_RHO1 + j + 1]
                @ drho[j:j + 1])

        res = np.zeros(31)
        Qi_inv = q_inverse(Qi)
        res[ILO_P:ILO_P + 3] = q_transform(
            Qi_inv, 0.5 * G * self.sum_dt**2 + Pj - Pi - Vi * self.sum_dt
        ) - corrected_delta_p
        res[ILO_R:ILO_R + 3] = 2.0 * q_mul(
            q_inverse(corrected_delta_q), q_mul(Qi_inv, Qj))[1:]
        res[ILO_V:ILO_V + 3] = q_transform(
            Qi_inv, G * self.sum_dt + Vj - Vi) - corrected_delta_v
        for j in range(NUM_OF_LEG):
            res[ILO_EPS1 + 3 * j:ILO_EPS1 + 3 * j + 3] = (
                q_transform(Qi_inv, Pj - Pi) - corrected_delta_epsilon[j])
            res[ILO_RHO1 + j] = rhoj[j] - rhoi[j]
        res[ILO_BA:ILO_BA + 3] = Baj - Bai
        res[ILO_BG:ILO_BG + 3] = Bgj - Bgi
        return res

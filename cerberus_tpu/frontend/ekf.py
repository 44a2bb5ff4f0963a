"""Contact-aided legged kinematic EKF (proprioceptive front-end).

Rebuild of the reference's missing `src/kalmanFilter` submodule
("legged-kalman-filter", SURVEY.md §2.9). Its public behavior, recovered from
the call sites (reference: main.cpp:39-40, 281-330, 174-190, 379-389):
  * ingest raw 500 Hz IMU + joint streams, lightly filtered
    (A1SensorData::input_imu/input_leg with MovingWindowFilter smoothing),
  * estimate per-leg contact probability from foot force
    (kf.get_contacts() feeds CONTACT_SENSOR_TYPE==0),
  * maintain an independent position/velocity state
    (kf.get_state()[0:3]=pos, [3:6]=vel) used for logging and republishing.

TPU-native design: the filter is a pure `ekf_step` (propagate + update fused,
jittable, vmappable to thousands of robots); `LeggedEKF` is a thin host
wrapper with the reference-shaped API. Instead of casadi-generated process
Jacobians, the error-state Jacobians are closed-form (the process model is
simple enough that symbolic codegen buys nothing).

State (error-state dim 21): [p(3), v(3), theta(3), pf1..pf4(12)]
  p, v   : body position/velocity in world
  theta  : attitude error (right perturbation of q)
  pf_j   : world position of foot j (random walk; tight in contact)
Measurements per leg (in contact):
  z1_j = R^T (pf_j - p) - fk(phi_j)           (relative foot position, 3)
  z2_j = -J phi' - w x fk  - R^T v            (leg-odometry velocity, 3)
  z3_j = pf_j.z                               (ground height ~ 0, 1)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cerberus_tpu import config as C
from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.kinematics.leg import all_legs_fk_jac
from cerberus_tpu.utils import lie
from cerberus_tpu.utils.filters import MovingWindowFilter

DIM = 21


class EKFParams(NamedTuple):
    rho_fix: jax.Array         # (4, 4)
    rho: jax.Array             # (4,) calf lengths
    p_br: jax.Array
    R_br: jax.Array
    gravity: jax.Array         # (3,)
    acc_n: jax.Array = None    # process noise
    gyr_n: jax.Array = None
    foot_walk_contact: jax.Array = None    # foot process noise in contact
    foot_walk_swing: jax.Array = None      # and in swing
    meas_fk_n: jax.Array = None
    meas_vel_n: jax.Array = None
    meas_height_n: jax.Array = None
    contact_force_thresh: jax.Array = None

    @staticmethod
    def from_config(cfg: EstimatorConfig, dtype=jnp.float64) -> "EKFParams":
        f = lambda x: jnp.asarray(x, dtype)
        nz = cfg.noise
        return EKFParams(
            rho_fix=f(cfg.robot.rho_fix()), rho=f(cfg.robot.rho_init()),
            p_br=f(cfg.robot.p_br), R_br=f(cfg.robot.R_br),
            gravity=f([0.0, 0.0, cfg.g_norm]),
            acc_n=f(nz.ekf_acc_n), gyr_n=f(nz.ekf_gyr_n),
            foot_walk_contact=f(nz.ekf_foot_walk_contact),
            foot_walk_swing=f(nz.ekf_foot_walk_swing),
            meas_fk_n=f(nz.ekf_meas_fk_n), meas_vel_n=f(nz.ekf_meas_vel_n),
            meas_height_n=f(nz.ekf_meas_height_n),
            contact_force_thresh=f(nz.ekf_contact_force_thresh),
        )


class EKFState(NamedTuple):
    p: jax.Array        # (3,)
    v: jax.Array        # (3,)
    q: jax.Array        # (4,) wxyz body->world
    pf: jax.Array       # (4, 3) foot world positions
    P: jax.Array        # (21, 21)
    contacts: jax.Array  # (4,) smoothed contact probability


def ekf_init(p, q, phi, params: EKFParams) -> EKFState:
    """Initialize with feet placed by FK from the initial pose."""
    dtype = params.gravity.dtype
    p = jnp.asarray(p, dtype)
    q = jnp.asarray(q, dtype)
    kin = all_legs_fk_jac(jnp.asarray(phi, dtype).reshape(4, 3),
                          jnp.tile(params.rho[:, None], (1, 1)), params.rho_fix)
    R = lie.quat_to_rot(q)
    foot_b = params.p_br[None] + kin["fk"] @ params.R_br.T
    pf = p[None] + foot_b @ R.T
    P = jnp.eye(DIM, dtype=dtype) * 1e-4
    return EKFState(p=p, v=jnp.zeros(3, dtype), q=q, pf=pf, P=P,
                    contacts=jnp.ones(4, dtype))


def ekf_step(s: EKFState, dt, acc, gyr, phi, dphi, foot_force,
             params: EKFParams) -> EKFState:
    """One propagate+update step (jittable)."""
    dtype = s.p.dtype
    I3 = jnp.eye(3, dtype=dtype)

    # ---- contact probability from foot force (schmitt-ish sigmoid) ----
    contact = jax.nn.sigmoid((foot_force - params.contact_force_thresh) / 5.0)
    contacts = 0.8 * s.contacts + 0.2 * contact

    # ---- propagate ----
    R = lie.quat_to_rot(s.q)
    acc_w = R @ acc - params.gravity
    p_new = s.p + s.v * dt + 0.5 * acc_w * dt * dt
    v_new = s.v + acc_w * dt
    q_new = lie.quat_normalize(lie.quat_mul(s.q, lie.delta_q(gyr * dt)))

    F = jnp.eye(DIM, dtype=dtype)
    F = F.at[0:3, 3:6].set(I3 * dt)
    F = F.at[3:6, 6:9].set(-R @ lie.skew(acc) * dt)

    Q = jnp.zeros((DIM,), dtype)
    Q = Q.at[0:3].set((0.5 * params.acc_n * dt * dt) ** 2)
    Q = Q.at[3:6].set((params.acc_n * dt) ** 2)
    Q = Q.at[6:9].set((params.gyr_n * dt) ** 2)
    foot_q = jnp.where(contact > 0.5, params.foot_walk_contact,
                       params.foot_walk_swing)
    Q = Q.at[9:21].set(jnp.repeat(foot_q ** 2 * dt, 3))
    P = F @ s.P @ F.T + jnp.diag(Q)

    # ---- measurement model ----
    kin = all_legs_fk_jac(phi.reshape(4, 3), params.rho[:, None].astype(dtype),
                          params.rho_fix)
    foot_b = params.p_br[None] + kin["fk"] @ params.R_br.T       # (4,3)
    Rn = lie.quat_to_rot(q_new)

    # z1: R^T (pf - p) - fk_body  (3 per leg)
    pred1 = (s.pf - p_new[None]) @ Rn - foot_b                   # rows: R^T(pf-p)
    # z2: leg velocity  -J dphi - w x fk  ==  R^T v  (3 per leg)
    vleg_b = -(params.R_br @ (kin["J"] @ dphi.reshape(4, 3, 1))[..., 0].T).T \
        - foot_b @ lie.skew(gyr).T
    pred2 = vleg_b - (Rn.T @ v_new)[None]
    # z3: foot height ~ 0 (1 per leg)
    pred3 = s.pf[:, 2]

    # stack innovations r = z - h(x) and H = dh/dx for all legs (contact-masked)
    #   z1 = foot_b (FK),  h1 = R^T (pf - p)   => r1 = -pred1
    #   z2 = vleg_b,       h2 = R^T v          => r2 = +pred2
    #   z3 = 0 (ground),   h3 = pf.z           => r3 = -pred3
    zdim = 4 * 7
    r = jnp.concatenate([-pred1.reshape(-1), pred2.reshape(-1), -pred3])
    H = jnp.zeros((zdim, DIM), dtype)
    Rdiag = jnp.zeros((zdim,), dtype)
    for j in range(4):
        c = contact[j]
        row1 = 3 * j
        H = H.at[row1:row1 + 3, 0:3].set(-Rn.T)
        H = H.at[row1:row1 + 3, 6:9].set(_dRtp_dtheta(Rn, s.pf[j] - p_new))
        H = H.at[row1:row1 + 3, 9 + 3 * j:12 + 3 * j].set(Rn.T)
        row2 = 12 + 3 * j
        H = H.at[row2:row2 + 3, 3:6].set(Rn.T)
        H = H.at[row2:row2 + 3, 6:9].set(_dRtp_dtheta(Rn, v_new))
        row3 = 24 + j
        H = H.at[row3, 11 + 3 * j].set(1.0)
        # noise: inflate hugely out of contact (gate at p=0.5; a smooth
        # 1+(1-c)*BIG would still inflate ~2500x at c=0.9975 and de-weight
        # solid stance — hard gating matches the reference's binary use of
        # contact flags for type-0 sensing)
        infl = jnp.where(c > 0.5, 1.0, 1e8)
        Rdiag = Rdiag.at[row1:row1 + 3].set(params.meas_fk_n ** 2 * infl)
        Rdiag = Rdiag.at[row2:row2 + 3].set(params.meas_vel_n ** 2 * infl)
        Rdiag = Rdiag.at[row3].set(params.meas_height_n ** 2 * infl)

    S = H @ P @ H.T + jnp.diag(Rdiag)
    K = jnp.linalg.solve(S, H @ P).T        # (21, zdim)
    dx = K @ r
    P_up = (jnp.eye(DIM, dtype=dtype) - K @ H) @ P
    P_up = 0.5 * (P_up + P_up.T)

    p_up = p_new + dx[0:3]
    v_up = v_new + dx[3:6]
    q_up = lie.quat_normalize(lie.quat_mul(q_new, lie.delta_q(dx[6:9])))
    pf_up = s.pf + dx[9:21].reshape(4, 3)
    return EKFState(p=p_up, v=v_up, q=q_up, pf=pf_up, P=P_up,
                    contacts=contacts)


def _dRtp_dtheta(R, vec):
    """d/dtheta [ (R expm(theta))^T vec ] at theta=0  =  skew(R^T vec)."""
    return lie.skew(R.T @ vec)


class LeggedEKF:
    """Host wrapper with the reference-shaped API (main.cpp call sites):
    input samples at 500 Hz, query state/contacts."""

    def __init__(self, cfg: EstimatorConfig | None = None, filter_window=10):
        self.cfg = cfg or EstimatorConfig()
        self.params = EKFParams.from_config(self.cfg)

        def _step_hp(s, dt, acc, gyr, phi, dphi, ff):
            # TPU f32 matmuls default to bf16 passes; the recursive P update
            # goes indefinite (NaN) at that precision — force full f32
            with jax.default_matmul_precision("highest"):
                return ekf_step(s, dt, acc, gyr, phi, dphi, ff, self.params)

        self._step = jax.jit(_step_hp)
        self.state: EKFState | None = None
        self.filt_acc = MovingWindowFilter(filter_window, 3)
        self.filt_gyr = MovingWindowFilter(filter_window, 3)
        self.filt_phi = MovingWindowFilter(filter_window // 2, 12)
        self.prev_t = None
        self.prev_phi = None

    def is_inited(self) -> bool:
        return self.state is not None

    def init_filter(self, t, acc, gyr, phi, p0=None):
        from cerberus_tpu.utils.lie import g_to_rot
        R0 = np.asarray(g_to_rot(jnp.asarray(np.asarray(acc, float))))
        from scipy.spatial.transform import Rotation
        q0 = np.roll(Rotation.from_matrix(R0).as_quat(), 1)
        self.state = ekf_init(np.zeros(3) if p0 is None else p0, q0,
                              np.asarray(phi), self.params)
        self.prev_t = t
        self.prev_phi = np.asarray(phi)

    def update_filter(self, t, acc, gyr, phi, dphi=None, foot_force=None):
        acc_f = self.filt_acc.update(acc)
        gyr_f = self.filt_gyr.update(gyr)
        phi_f = self.filt_phi.update(phi)
        dt = t - self.prev_t
        if dphi is None:
            # joint velocities by differentiating angles (reference README:133)
            dphi = (phi_f - self.prev_phi) / max(dt, 1e-6)
        if foot_force is None:
            foot_force = np.full(4, 100.0)
        self.prev_t = t
        self.prev_phi = phi_f
        if dt <= 0:
            return
        self.state = self._step(
            self.state, jnp.asarray(dt), jnp.asarray(acc_f),
            jnp.asarray(gyr_f), jnp.asarray(phi_f), jnp.asarray(dphi),
            jnp.asarray(np.asarray(foot_force, float)))

    def get_state(self) -> np.ndarray:
        """[0:3]=pos, [3:6]=vel (reference main.cpp:379-389 layout)."""
        s = self.state
        return np.concatenate([np.asarray(s.p), np.asarray(s.v),
                               np.asarray(s.pf).reshape(-1)])

    def get_contacts(self) -> np.ndarray:
        return np.asarray(self.state.contacts)

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

State (error-state dim 27): [p(3), v(3), theta(3), pf1..pf4(12), ba(3), bg(3)]
  p, v   : body position/velocity in world
  theta  : attitude error (right perturbation of q)
  pf_j   : world position of foot j (random walk; tight in contact)
  ba, bg : IMU accel/gyro biases (random walk) — without them, unmodeled
           gyro bias integrates into unbounded yaw drift (measured: 2.0%
           EKF-only drift at 60 s without bias states)
Measurements per leg (in contact), with z/h split so the state-dependent
terms live in h and the Jacobian H comes from jacfwd (exact by
construction):
  z1_j = fk(phi_j)     h1_j = R^T (pf_j - p)         (foot position, 3)
  z2_j = -J phi'       h2_j = R^T v + (w - bg) x fk  (leg velocity, 3)
  z3_j = 0             h3_j = pf_j.z                 (ground height, 1)
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

DIM = 27


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
    acc_bias_walk: jax.Array = None
    gyr_bias_walk: jax.Array = None
    slip_gate_chi2: jax.Array = None
    force_var_rescale: jax.Array = None

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
            acc_bias_walk=f(nz.ekf_acc_bias_walk),
            gyr_bias_walk=f(nz.ekf_gyr_bias_walk),
            slip_gate_chi2=f(nz.ekf_slip_gate_chi2),
            force_var_rescale=f(nz.ekf_force_var_rescale),
        )


class EKFState(NamedTuple):
    p: jax.Array        # (3,)
    v: jax.Array        # (3,)
    q: jax.Array        # (4,) wxyz body->world
    pf: jax.Array       # (4, 3) foot world positions
    ba: jax.Array       # (3,) accel bias
    bg: jax.Array       # (3,) gyro bias
    P: jax.Array        # (27, 27)
    contacts: jax.Array  # (4,) smoothed contact probability
    # filtered foot-force statistics for contact estimation (the kf_lib
    # design estimates contact probability from force statistics, not a
    # fixed threshold; same adaptive min/max tracker as the
    # preintegration's force-sigmoid model, ops/preintegration.py:388-401 /
    # reference imu_leg_integration_base.cpp:183-229)
    ff_min: jax.Array   # (4,) decaying force-minimum tracker
    ff_max: jax.Array   # (4,) decaying force-maximum tracker
    ff_window: jax.Array  # (4, W) recent forces for the variance term
    ff_idx: jax.Array   # () int32 ring index


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
    # bias uncertainty: biases start unknown at ~typical MEMS scales
    P = P.at[21:24, 21:24].set(jnp.eye(3, dtype=dtype) * 0.05 ** 2)
    P = P.at[24:27, 24:27].set(jnp.eye(3, dtype=dtype) * 0.01 ** 2)
    return EKFState(p=p, v=jnp.zeros(3, dtype), q=q, pf=pf,
                    ba=jnp.zeros(3, dtype), bg=jnp.zeros(3, dtype), P=P,
                    contacts=jnp.ones(4, dtype),
                    ff_min=jnp.zeros(4, dtype), ff_max=jnp.zeros(4, dtype),
                    ff_window=jnp.zeros((4, C.FOOT_VAR_WINDOW_SIZE), dtype),
                    ff_idx=jnp.zeros((), jnp.int32))


def ekf_step(s: EKFState, dt, acc, gyr, phi, dphi, foot_force,
             params: EKFParams) -> EKFState:
    """One propagate+update step (jittable)."""
    dtype = s.p.dtype
    I3 = jnp.eye(3, dtype=dtype)

    # ---- contact probability from FILTERED FORCE STATISTICS ----
    # Adaptive per-leg normalization instead of a fixed newton threshold:
    # decaying min/max trackers place the stance/swing decision boundary at
    # a fixed fraction of each leg's observed force range, so the estimate
    # survives load shifts, slopes and payload changes that move the
    # absolute force scale (kf_lib behavior; identical tracker to the
    # preintegration's type-2 model / imu_leg_integration_base.cpp:183-229).
    ff_min = jnp.where(foot_force < s.ff_min,
                       0.9 * s.ff_min + 0.1 * foot_force, s.ff_min)
    ff_max = jnp.where(foot_force > s.ff_max,
                       0.9 * s.ff_max + 0.1 * foot_force, s.ff_max)
    ff_min = ff_min * 0.9991
    ff_max = ff_max * 0.997
    rng = jnp.maximum(ff_max - ff_min, 1e-6)
    thres = ff_min + 0.5 * rng
    # steepness in NORMALIZED force units (6/range): scale-free, saturating
    # near the range extremes
    contact = jax.nn.sigmoid(6.0 * (foot_force - thres) / rng)
    contacts = 0.8 * s.contacts + 0.2 * contact
    ff_idx = (s.ff_idx + 1) % C.FOOT_VAR_WINDOW_SIZE
    ff_window = s.ff_window.at[:, ff_idx].set(foot_force)
    ff_mean = jnp.mean(ff_window, axis=1, keepdims=True)
    # normalized short-window force variance: impact transients / slipping
    # stance phases carry high variance -> de-weight that leg's kinematic
    # measurements below
    ff_var_n = jnp.sum((ff_window - ff_mean) ** 2, axis=1) \
        / (C.FOOT_VAR_WINDOW_SIZE - 1) / (rng * rng)

    # ---- propagate (bias-corrected IMU) ----
    acc_u = acc - s.ba
    gyr_u = gyr - s.bg
    R = lie.quat_to_rot(s.q)
    acc_w = R @ acc_u - params.gravity
    p_new = s.p + s.v * dt + 0.5 * acc_w * dt * dt
    v_new = s.v + acc_w * dt
    q_new = lie.quat_normalize(lie.quat_mul(s.q, lie.delta_q(gyr_u * dt)))

    F = jnp.eye(DIM, dtype=dtype)
    F = F.at[0:3, 3:6].set(I3 * dt)
    F = F.at[3:6, 6:9].set(-R @ lie.skew(acc_u) * dt)
    F = F.at[3:6, 21:24].set(-R * dt)             # dv / dba
    F = F.at[6:9, 24:27].set(-I3 * dt)            # dtheta / dbg

    Q = jnp.zeros((DIM,), dtype)
    Q = Q.at[0:3].set((0.5 * params.acc_n * dt * dt) ** 2)
    Q = Q.at[3:6].set((params.acc_n * dt) ** 2)
    Q = Q.at[6:9].set((params.gyr_n * dt) ** 2)
    foot_q = jnp.where(contact > 0.5, params.foot_walk_contact,
                       params.foot_walk_swing)
    Q = Q.at[9:21].set(jnp.repeat(foot_q ** 2 * dt, 3))
    Q = Q.at[21:24].set(params.acc_bias_walk ** 2 * dt)
    Q = Q.at[24:27].set(params.gyr_bias_walk ** 2 * dt)
    P = F @ s.P @ F.T + jnp.diag(Q)

    # ---- measurement model (z/h split; H by jacfwd, exact) ----
    kin = all_legs_fk_jac(phi.reshape(4, 3), params.rho[:, None].astype(dtype),
                          params.rho_fix)
    foot_b = params.p_br[None] + kin["fk"] @ params.R_br.T       # (4,3)
    jdphi = (params.R_br @ (kin["J"] @ dphi.reshape(4, 3, 1))[..., 0].T).T

    # measured side: z1 = fk (foot pos), z2 = -J dphi (leg vel), z3 = 0
    z = jnp.concatenate([foot_b.reshape(-1), (-jdphi).reshape(-1),
                         jnp.zeros(4, dtype)])

    def h_of(dx):
        p = p_new + dx[0:3]
        v = v_new + dx[3:6]
        q = lie.quat_mul(q_new, lie.delta_q(dx[6:9]))
        pf = s.pf + dx[9:21].reshape(4, 3)
        bg = s.bg + dx[24:27]
        Rq = lie.quat_to_rot(q)
        h1 = (pf - p[None]) @ Rq                              # R^T (pf - p)
        wb = gyr - bg
        h2 = (Rq.T @ v)[None] + jnp.cross(jnp.broadcast_to(wb, (4, 3)),
                                          foot_b)
        h3 = pf[:, 2]
        return jnp.concatenate([h1.reshape(-1), h2.reshape(-1), h3])

    zero = jnp.zeros((DIM,), dtype)
    r = z - h_of(zero)
    H = jax.jacfwd(h_of)(zero)                                # (28, 27)

    zdim = 4 * 7
    Rdiag = jnp.zeros((zdim,), dtype)
    for j in range(4):
        # noise: inflate hugely out of contact (gate at p=0.5; a smooth
        # 1+(1-c)*BIG would still inflate ~2500x at c=0.9975 and de-weight
        # solid stance — hard gating matches the reference's binary use of
        # contact flags for type-0 sensing). In stance, the short-window
        # force variance additionally de-weights transient/slipping phases
        # (the preintegration's n2 term, imu_leg_integration_base.cpp:
        # 290-317 rescaled variance).
        infl = jnp.where(contact[j] > 0.5,
                         1.0 + params.force_var_rescale * ff_var_n[j], 1e8)
        Rdiag = Rdiag.at[3 * j:3 * j + 3].set(params.meas_fk_n ** 2 * infl)
        Rdiag = Rdiag.at[12 + 3 * j:15 + 3 * j].set(
            params.meas_vel_n ** 2 * infl)
        Rdiag = Rdiag.at[24 + j].set(params.meas_height_n ** 2 * infl)

    # ---- innovation-gated slip rejection (two-pass update) ----
    # A slipping foot passes the contact test (force stays high) but its
    # kinematic velocity measurement is inconsistent with the filter state.
    # Whiten each leg's velocity-innovation by its predicted covariance; a
    # leg beyond the chi^2_3 99% gate (11.34) gets its measurements
    # inflated in proportion before the real update — a one-step
    # M-estimator on the leg channel.
    S = H @ P @ H.T + jnp.diag(Rdiag)
    gate = params.slip_gate_chi2
    infl2 = jnp.ones((zdim,), dtype)
    for j in range(4):
        sl = slice(12 + 3 * j, 15 + 3 * j)
        Sj = S[sl, sl]
        rj = r[sl]
        m = rj @ jnp.linalg.solve(Sj, rj)
        fac = jnp.where(gate > 0,
                        jnp.maximum(m / jnp.maximum(gate, 1e-9), 1.0), 1.0)
        infl2 = infl2.at[3 * j:3 * j + 3].mul(fac)
        infl2 = infl2.at[sl].mul(fac)
        infl2 = infl2.at[24 + j].mul(fac)
    Rdiag = Rdiag * infl2
    S = H @ P @ H.T + jnp.diag(Rdiag)
    K = jnp.linalg.solve(S, H @ P).T        # (27, zdim)
    dx = K @ r
    P_up = (jnp.eye(DIM, dtype=dtype) - K @ H) @ P
    P_up = 0.5 * (P_up + P_up.T)

    p_up = p_new + dx[0:3]
    v_up = v_new + dx[3:6]
    q_up = lie.quat_normalize(lie.quat_mul(q_new, lie.delta_q(dx[6:9])))
    pf_up = s.pf + dx[9:21].reshape(4, 3)
    return EKFState(p=p_up, v=v_up, q=q_up, pf=pf_up,
                    ba=s.ba + dx[21:24], bg=s.bg + dx[24:27], P=P_up,
                    contacts=contacts, ff_min=ff_min, ff_max=ff_max,
                    ff_window=ff_window, ff_idx=ff_idx)


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

        # pin the 27-dim filter to the HOST CPU backend: it runs one tiny
        # step per 500 Hz sensor tick, and dispatching that through a
        # relayed TPU costs a ~30 ms round-trip each (measured: 2386 s wall
        # for a 60 s EKF-only replay). A production deployment batches
        # thousands of robots' EKFs on-device (parallel/fleet); the
        # single-robot sequential filter belongs on the host.
        try:
            self._cpu = jax.local_devices(backend="cpu")[0]
        except Exception:
            self._cpu = None
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
        import contextlib
        from cerberus_tpu.utils.lie import g_to_rot
        ctx = (jax.default_device(self._cpu) if self._cpu is not None
               else contextlib.nullcontext())
        with ctx:
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
        import contextlib
        ctx = (jax.default_device(self._cpu) if self._cpu is not None
               else contextlib.nullcontext())
        with ctx:
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

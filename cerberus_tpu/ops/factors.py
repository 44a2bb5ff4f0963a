"""Window factor graph: states, data, residual stacking, linearization.

TPU-native replacement for the reference's Ceres problem construction
(reference: src/estimator/estimator.cpp:1054-1241 and src/factor/*): the
sliding window is a fixed-shape pytree; every factor class becomes a masked,
vmapped residual; the full stacked residual is linearized with ONE `jacfwd`
over the window tangent, producing a dense Jacobian that feeds a batched
Gauss-Newton/LM core (ops/solver.py). No per-factor hand Jacobians: AD at the
manifold tangent reproduces the reference's analytic ones (verified in
tests/test_factors.py), which is both simpler and exactly consistent.

Tangent layout (dimension D = 222), SEGMENT-major so every factor type's
Hessian contribution lands in statically-sliceable blocks (scatter-free
assembly on TPU, see ops/structured.py):
  poses            : [dp(3), dtheta(3)] of frame i at 6*i            (0..65)
  speed/bias       : [dv(3), dba(3), dbg(3)] of frame i at 66 + 9*i  (66..164)
  leg bias         : drho(4) of frame i at 165 + 4*i                 (165..208)
  ex cam c in 0..1 : [dtic(3), dtheta_ic(3)] at 209 + 6*c            (209..220)
  td               : scalar at 221
  feature depths   : F extra dims appended after D (inverse depths)

Residual stack (rows):
  [0, 310)           10 x 31 whitened IMU+leg residuals
  [310, 310 + F*44)  (F, 11, 2+2) projection residuals: per (feature, frame)
                     a mono two-frame block and a stereo block (which is the
                     one-frame-two-cam factor when frame == anchor)
  [.., +222)         marginalization prior rows
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cerberus_tpu import config as C
from cerberus_tpu.utils import lie

NF = C.NUM_FRAMES            # 11
PER_FRAME = 19               # tangent dims per frame (6 pose + 9 sb + 4 rho)
POSE_OFF = 0                 # poses: 6 dims x 11 frames
SB_OFF = 6 * NF              # 66: speed/bias: 9 dims x 11 frames
RHO_OFF = SB_OFF + 9 * NF    # 165: leg bias: 4 dims x 11 frames
EX0_OFF = RHO_OFF + 4 * NF   # 209
TD_OFF = EX0_OFF + 12        # 221
D_DENSE = TD_OFF + 1         # 222


def frame_tangent_indices(i: int):
    """Global tangent indices of frame i's 19 dims (pose, sb, rho)."""
    import numpy as _np
    return _np.concatenate([
        _np.arange(POSE_OFF + 6 * i, POSE_OFF + 6 * i + 6),
        _np.arange(SB_OFF + 9 * i, SB_OFF + 9 * i + 9),
        _np.arange(RHO_OFF + 4 * i, RHO_OFF + 4 * i + 4),
    ])
PROJ_SQRT_INFO = C.FOCAL_LENGTH / 1.5  # reference: estimator.cpp:124-126
HUBER_DELTA = 1.0            # reference: estimator.cpp:1062


class WindowState(NamedTuple):
    """All optimized variables of one sliding window (fixed shapes)."""

    p: jax.Array      # (11, 3)
    q: jax.Array      # (11, 4) wxyz
    v: jax.Array      # (11, 3)
    ba: jax.Array     # (11, 3)
    bg: jax.Array     # (11, 3)
    rho: jax.Array    # (11, 4)
    tic: jax.Array    # (2, 3)
    qic: jax.Array    # (2, 4)
    td: jax.Array     # ()
    depth: jax.Array  # (F,) inverse depths in anchor frame

    @staticmethod
    def zero(F: int, dtype=jnp.float64) -> "WindowState":
        z = lambda *s: jnp.zeros(s, dtype)
        qid = jnp.tile(lie.quat_identity(dtype), (NF, 1))
        return WindowState(
            p=z(NF, 3), q=qid, v=z(NF, 3), ba=z(NF, 3), bg=z(NF, 3),
            rho=jnp.full((NF, 4), 0.21, dtype),
            tic=z(2, 3), qic=jnp.tile(lie.quat_identity(dtype), (2, 1)),
            td=jnp.zeros((), dtype), depth=jnp.ones((F,), dtype),
        )


class WindowData(NamedTuple):
    """Measurements + linearized prior for one window problem."""

    # stacked IMU+leg preintegrations per interval k: frames k -> k+1
    pre_dp: jax.Array       # (10, 3)
    pre_dq: jax.Array       # (10, 4)
    pre_dv: jax.Array       # (10, 3)
    pre_deps: jax.Array     # (10, 4, 3)
    pre_J: jax.Array        # (10, 31, 31)
    pre_L: jax.Array        # (10, 31, 31) cholesky(P): whitening solves L r
    pre_dt: jax.Array       # (10,)
    pre_ba: jax.Array       # (10, 3) linearization biases
    pre_bg: jax.Array       # (10, 3)
    pre_rho: jax.Array      # (10, 4)
    interval_valid: jax.Array  # (10,) bool

    # features
    f_start: jax.Array      # (F,) int32 anchor frame index
    f_pts: jax.Array        # (F, 11, 3) normalized obs (left cam)
    f_pts_r: jax.Array      # (F, 11, 3) right cam
    f_vel: jax.Array        # (F, 11, 2) feature image velocity (left)
    f_vel_r: jax.Array      # (F, 11, 2)
    f_td: jax.Array         # (F, 11) per-obs frame td offset (cur_td)
    f_obs: jax.Array        # (F, 11) bool observation mask (left)
    f_stereo: jax.Array     # (F, 11) bool stereo mask
    f_valid: jax.Array      # (F,) bool slot participates in the problem

    # marginalization prior: r = prior_r + prior_J @ (x [-] prior_lin)
    prior_J: jax.Array      # (222, 222)
    prior_r: jax.Array      # (222,)
    prior_valid: jax.Array  # () bool
    prior_lin: "WindowState"  # linearization point (depth ignored)

    free_mask: jax.Array    # (222,) bool — optimizable dense dims
    gravity: jax.Array      # (3,)

    # standing weak calibration prior pinning extrinsics/td near their config
    # values (13 rows: ex0(6), ex1(6), td). NOT part of the marginalization
    # sub-problem (marginalize_old zeroes calib_w) so its information never
    # accumulates — it only bounds the wander of these weakly-observable
    # states along near-null directions between keyframes. The reference has
    # no such prior and relies on rich motion to keep extrinsics observable;
    # on gentle trajectories its Ceres DOGLEG trust region plays the same
    # step-bounding role.
    calib_w: jax.Array      # (13,) sqrt-information diagonal (0 disables)
    calib_tic: jax.Array    # (2, 3) reference extrinsic translations
    calib_qic: jax.Array    # (2, 4) reference extrinsic rotations (wxyz)
    calib_td: jax.Array     # () reference time offset


def num_residuals(F: int) -> int:
    return 310 + F * 44 + D_DENSE + 13


def tangent_dim(F: int) -> int:
    return D_DENSE + F


# ---------------------------------------------------------------------------
# retraction  x = lin [+] delta
# ---------------------------------------------------------------------------

def retract(s: WindowState, delta: jax.Array) -> WindowState:
    F = s.depth.shape[0]
    pose = delta[POSE_OFF:POSE_OFF + 6 * NF].reshape(NF, 6)
    sb = delta[SB_OFF:SB_OFF + 9 * NF].reshape(NF, 9)
    rho = delta[RHO_OFF:RHO_OFF + 4 * NF].reshape(NF, 4)
    ex = delta[EX0_OFF:EX0_OFF + 12].reshape(2, 6)
    return WindowState(
        p=s.p + pose[:, 0:3],
        q=lie.quat_normalize(lie.quat_mul(s.q, lie.delta_q(pose[:, 3:6]))),
        v=s.v + sb[:, 0:3],
        ba=s.ba + sb[:, 3:6],
        bg=s.bg + sb[:, 6:9],
        rho=s.rho + rho,
        tic=s.tic + ex[:, 0:3],
        qic=lie.quat_normalize(lie.quat_mul(s.qic, lie.delta_q(ex[:, 3:6]))),
        td=s.td + delta[TD_OFF],
        depth=s.depth + delta[D_DENSE:],
    )


def local_diff(s: WindowState, lin: WindowState) -> jax.Array:
    """Dense-tangent x [-] lin (quaternion-aware), the prior's dx
    (reference: marginalization_factor.cpp:361-378)."""
    dth = 2.0 * lie.quat_mul(lie.quat_conj(lin.q), s.q)[..., 1:]
    pose = jnp.concatenate([s.p - lin.p, dth], axis=-1).reshape(-1)
    sb = jnp.concatenate([s.v - lin.v, s.ba - lin.ba, s.bg - lin.bg],
                         axis=-1).reshape(-1)
    rho = (s.rho - lin.rho).reshape(-1)
    dth_ic = 2.0 * lie.quat_mul(lie.quat_conj(lin.qic), s.qic)[..., 1:]
    ex = jnp.concatenate([s.tic - lin.tic, dth_ic], axis=-1).reshape(-1)
    return jnp.concatenate([pose, sb, rho, ex, (s.td - lin.td)[None]])


# ---------------------------------------------------------------------------
# residual stack
# ---------------------------------------------------------------------------

def _ileg_residuals(st: WindowState, data: WindowData):
    """(10, 31) whitened IMU+leg residuals (reference: imu_leg_factor.cpp)."""

    def one(k):
        Jk = data.pre_J[k]
        dba = st.ba[k] - data.pre_ba[k]
        dbg = st.bg[k] - data.pre_bg[k]
        drho = st.rho[k] - data.pre_rho[k]
        dp = (data.pre_dp[k] + Jk[0:3, C.ILO_BA:C.ILO_BA + 3] @ dba
              + Jk[0:3, C.ILO_BG:C.ILO_BG + 3] @ dbg)
        dq = lie.quat_mul(data.pre_dq[k],
                          lie.delta_q(Jk[3:6, C.ILO_BG:C.ILO_BG + 3] @ dbg))
        dv = (data.pre_dv[k] + Jk[6:9, C.ILO_BA:C.ILO_BA + 3] @ dba
              + Jk[6:9, C.ILO_BG:C.ILO_BG + 3] @ dbg)

        qi, qj = st.q[k], st.q[k + 1]
        qi_inv = lie.quat_conj(qi)
        T = data.pre_dt[k]
        g = data.gravity
        r_p = lie.quat_rotate(qi_inv, 0.5 * g * T * T + st.p[k + 1] - st.p[k]
                              - st.v[k] * T) - dp
        r_q = 2.0 * lie.quat_mul(lie.quat_conj(dq), lie.quat_mul(qi_inv, qj))[1:]
        r_v = lie.quat_rotate(qi_inv, g * T + st.v[k + 1] - st.v[k]) - dv
        rel_p = lie.quat_rotate(qi_inv, st.p[k + 1] - st.p[k])
        r_eps = []
        for j in range(4):
            rr = C.ILO_EPS + 3 * j
            deps_j = (data.pre_deps[k, j] + Jk[rr:rr + 3, C.ILO_BG:C.ILO_BG + 3] @ dbg
                      + Jk[rr:rr + 3, C.ILO_RHO + j] * drho[j])
            r_eps.append(rel_p - deps_j)
        raw = jnp.concatenate(
            [r_p, r_q, r_v] + r_eps
            + [st.ba[k + 1] - st.ba[k], st.bg[k + 1] - st.bg[k],
               st.rho[k + 1] - st.rho[k]])
        # whiten: r' = L^-1 raw with P = L L^T
        white = jax.scipy.linalg.solve_triangular(data.pre_L[k], raw, lower=True)
        return jnp.where(data.interval_valid[k], white, 0.0)

    return jax.vmap(one)(jnp.arange(10))


def _proj_residuals(st: WindowState, data: WindowData):
    """(F, 11, 4) projection residuals.

    Per (feature f, frame j): rows 0:2 = mono two-frame factor (anchor i ->
    frame j, left cam; reference projectionTwoFrameOneCamFactor.cpp:59-145);
    rows 2:4 = stereo factor into the right cam at frame j (two-frame when
    j != i, one-frame-two-cam when j == i)."""
    F = st.depth.shape[0]

    def one(f, j):
        i = data.f_start[f]
        pts_i = data.f_pts[f, i]
        vel_i = data.f_vel[f, i]
        td_i = data.f_td[f, i]
        pts_j = data.f_pts[f, j]
        vel_j = data.f_vel[f, j]
        td_j = data.f_td[f, j]

        dt_i = st.td - td_i
        dt_j = st.td - td_j
        pts_i_td = pts_i - dt_i * jnp.concatenate([vel_i, jnp.zeros(1, pts_i.dtype)])
        pts_j_td = pts_j - dt_j * jnp.concatenate([vel_j, jnp.zeros(1, pts_i.dtype)])

        inv_dep = st.depth[f]
        pts_cam_i = pts_i_td / inv_dep
        pts_imu_i = lie.quat_rotate(st.qic[0], pts_cam_i) + st.tic[0]
        pts_w = lie.quat_rotate(st.q[i], pts_imu_i) + st.p[i]

        # mono: into left cam at frame j
        pts_imu_j = lie.quat_rotate(lie.quat_conj(st.q[j]), pts_w - st.p[j])
        pts_cam_j = lie.quat_rotate(lie.quat_conj(st.qic[0]), pts_imu_j - st.tic[0])
        zj = pts_cam_j[2]
        r_mono = PROJ_SQRT_INFO * (pts_cam_j[:2] / jnp.where(jnp.abs(zj) < 1e-6, 1e-6, zj)
                                   - pts_j_td[:2])
        mono_ok = (data.f_obs[f, j] & data.f_obs[f, i] & (j != i)
                   & data.f_valid[f])
        r_mono = jnp.where(mono_ok, r_mono, 0.0)

        # stereo: into right cam at frame j (works for j == i too)
        pts_jr = data.f_pts_r[f, j]
        vel_jr = data.f_vel_r[f, j]
        pts_jr_td = pts_jr - dt_j * jnp.concatenate([vel_jr, jnp.zeros(1, pts_i.dtype)])
        pts_cam_jr = lie.quat_rotate(lie.quat_conj(st.qic[1]), pts_imu_j - st.tic[1])
        zr = pts_cam_jr[2]
        r_st = PROJ_SQRT_INFO * (pts_cam_jr[:2] / jnp.where(jnp.abs(zr) < 1e-6, 1e-6, zr)
                                 - pts_jr_td[:2])
        st_ok = (data.f_stereo[f, j] & data.f_obs[f, i] & data.f_valid[f])
        r_st = jnp.where(st_ok, r_st, 0.0)
        return jnp.concatenate([r_mono, r_st])

    fidx = jnp.arange(F)
    jidx = jnp.arange(NF)
    return jax.vmap(lambda f: jax.vmap(lambda j: one(f, j))(jidx))(fidx)


def _prior_residuals(st: WindowState, data: WindowData):
    dx = local_diff(st, data.prior_lin)
    r = data.prior_r + data.prior_J @ dx
    return jnp.where(data.prior_valid, r, 0.0)


def _calib_residuals(st: WindowState, data: WindowData):
    """(13,) whitened calibration-prior rows: [ex0(6), ex1(6), td]."""
    dth_ic = 2.0 * lie.quat_mul(lie.quat_conj(data.calib_qic), st.qic)[..., 1:]
    ex = jnp.concatenate([st.tic - data.calib_tic, dth_ic], axis=-1).reshape(12)
    return data.calib_w * jnp.concatenate([ex, (st.td - data.calib_td)[None]])


def window_residuals(lin: WindowState, delta: jax.Array, data: WindowData):
    """Full stacked residual at lin [+] delta. Returns (N,) vector."""
    st = retract(lin, delta)
    r_ileg = _ileg_residuals(st, data).reshape(-1)
    r_proj = _proj_residuals(st, data).reshape(-1)
    r_prior = _prior_residuals(st, data)
    r_calib = _calib_residuals(st, data)
    return jnp.concatenate([r_ileg, r_proj, r_prior, r_calib])


def proj_row_slice(F: int):
    return slice(310, 310 + F * 44)


def huber_row_weights(r: jax.Array, F: int):
    """Per-row sqrt IRLS weights: Huber(1.0) on each 2-dim projection block
    (reference applies ceres::HuberLoss(1.0) to projection factors only)."""
    w = jnp.ones_like(r)
    pr = r[proj_row_slice(F)].reshape(-1, 2)
    sq = jnp.sum(pr * pr, axis=1)
    # Huber: rho'(s) = 1 for s <= delta^2 else delta/sqrt(s)
    wblk = jnp.where(sq <= HUBER_DELTA ** 2, 1.0,
                     HUBER_DELTA / jnp.sqrt(jnp.maximum(sq, 1e-30)))
    wrow = jnp.sqrt(jnp.repeat(wblk, 2))
    return w.at[proj_row_slice(F)].set(wrow)


def robust_cost(r: jax.Array, F: int):
    """0.5 * sum of rho(s) with Huber on projection blocks, quadratic elsewhere."""
    sl = proj_row_slice(F)
    pr = r[sl].reshape(-1, 2)
    sq = jnp.sum(pr * pr, axis=1)
    d2 = HUBER_DELTA ** 2
    rho = jnp.where(sq <= d2, sq, 2.0 * HUBER_DELTA * jnp.sqrt(jnp.maximum(sq, 1e-30)) - d2)
    other = jnp.sum(r[: sl.start] ** 2) + jnp.sum(r[sl.stop:] ** 2)
    return 0.5 * (jnp.sum(rho) + other)


def linearize(lin: WindowState, data: WindowData):
    """Residual r and dense Jacobian J at delta = 0, with IRLS row weights and
    free-mask column zeroing applied. J: (N, D_DENSE + F)."""
    F = lin.depth.shape[0]
    dim = tangent_dim(F)
    zero = jnp.zeros((dim,), lin.p.dtype)
    r0 = window_residuals(lin, zero, data)
    J = jax.jacfwd(lambda d: window_residuals(lin, d, data))(zero)
    w = huber_row_weights(r0, F)
    r = r0 * w
    J = J * w[:, None]
    col_mask = jnp.concatenate([
        data.free_mask.astype(lin.p.dtype),
        data.f_valid.astype(lin.p.dtype)])
    J = J * col_mask[None, :]
    return r, J, r0


def feature_reproj_errors(st: WindowState, data: WindowData):
    """(F,) average unwhitened reprojection error per feature, in normalized
    units (multiply by FOCAL_LENGTH for pixels) — reference:
    estimator.cpp:1741-1798 outliersRejection."""
    r = _proj_residuals(st, data) / PROJ_SQRT_INFO  # (F, 11, 4)
    err = jnp.linalg.norm(r.reshape(r.shape[0], -1, 2), axis=-1)  # (F, 22)
    mono_ok = data.f_obs & (jnp.arange(NF)[None, :] != data.f_start[:, None])
    cnt_blk = jnp.stack([mono_ok, data.f_stereo], axis=-1).reshape(r.shape[0], -1)
    cnt = jnp.sum(cnt_blk, axis=1)
    return jnp.sum(err, axis=1) / jnp.maximum(cnt, 1)

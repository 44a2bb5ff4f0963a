"""Monocular initialization machinery: relative pose, extrinsic-rotation
calibration, global SfM, and visual-IMU alignment.

TPU-native re-design of the reference's `src/initial/` family
(reference: initial_sfm.{h,cpp}, solve_5pts.{h,cpp},
initial_ex_rotation.{h,cpp}, initial_aligment.cpp:126-293). In the reference
these power the mono+IMU bootstrap (the active stereo path keeps them
compiled and instantiated, estimator.h:176-177, while the mono call site is
commented at estimator.cpp:709-731); they are provided here so the framework
carries the full model family:

  * `relative_pose_ransac` — essential-matrix RANSAC. The reference calls
    cv::findFundamentalMat (solve_5pts.cpp:24-29); here the hypothesis fit is
    a batched 8-point solve: all RANSAC hypotheses are one vmapped (H, 8, 9)
    SVD batch — MXU/XLA-friendly breadth instead of a sequential loop.
  * `decompose_essential` / `recover_pose` — the four-way (R, t)
    disambiguation by triangulated-depth voting (solve_5pts.cpp:32-79).
  * `calibrate_ex_rotation` — camera-IMU rotation calibration from rotation
    pairs via the stacked Qleft-Qright quaternion system with Huber angular
    weights (initial_ex_rotation.cpp:22-81).
  * `global_sfm` — windowed mono structure-from-motion: triangulate seed
    pair, PnP chaining, full bundle adjustment (initial_sfm.cpp construct()).
    The Ceres BA becomes a masked fixed-shape GN loop with AD Jacobians.
  * `visual_imu_alignment` — gyro-bias + scale/gravity/velocity linear
    alignment with gravity refinement on its tangent basis
    (initial_aligment.cpp:126-293).

All functions are pure and fixed-shape; RANSAC sampling uses a JAX PRNG key.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cerberus_tpu.utils import lie


# ---------------------------------------------------------------------------
# Essential matrix / relative pose (reference: solve_5pts.cpp)
# ---------------------------------------------------------------------------


def _eight_point(p0, p1):
    """E from >= 8 normalized correspondences (p: (8, 2)). Returns (3, 3)."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    one = jnp.ones_like(x0)
    # x1^T E x0 = 0 rows
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, one],
                  axis=1)                                   # (8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    # enforce essential-matrix singular values (1, 1, 0)
    U, _, Vt2 = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ Vt2
    return E


def _sampson_sq(E, p0, p1):
    """Squared Sampson distance of correspondences under E (normalized)."""
    x0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], axis=1)  # (N, 3)
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)
    Ex0 = x0 @ E.T            # (N, 3)
    Etx1 = x1 @ E             # (N, 3)
    num = jnp.sum(x1 * Ex0, axis=1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-18)


def _triangulate_pair(R, t, p0, p1):
    """Midpoint-free DLT of each correspondence under cam0=[I|0], cam1=[R|t].
    Returns points in cam0 and their depths in both cams."""
    P0 = jnp.concatenate([jnp.eye(3, dtype=R.dtype),
                          jnp.zeros((3, 1), R.dtype)], axis=1)
    P1 = jnp.concatenate([R, t[:, None]], axis=1)

    def one(a, b):
        A = jnp.stack([
            a[0] * P0[2] - P0[0],
            a[1] * P0[2] - P0[1],
            b[0] * P1[2] - P1[0],
            b[1] * P1[2] - P1[1],
        ])
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        X = X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        z0 = X[2]
        z1 = (R @ X + t)[2]
        return X, z0, z1

    return jax.vmap(one)(p0, p1)


def decompose_essential(E):
    """Four (R, t) candidates from E (reference: decomposeE,
    solve_5pts.cpp:82-103). Returns R (4, 3, 3), t (4, 3)."""
    U, _, Vt = jnp.linalg.svd(E)
    # keep proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def recover_pose(E, p0, p1, mask):
    """Pick the (R, t) candidate with the most points in front of both
    cameras (cheirality vote, reference: testTriangulation,
    solve_5pts.cpp:32-60). Returns (R, t, votes)."""
    Rs, ts = decompose_essential(E)

    def score(R, t):
        _, z0, z1 = _triangulate_pair(R, t, p0, p1)
        ok = (z0 > 0) & (z1 > 0) & mask
        return jnp.sum(ok)

    votes = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(votes)
    return Rs[best], ts[best], votes[best]


@partial(jax.jit, static_argnames=("n_hyp",))
def relative_pose_ransac(key, p0, p1, mask, n_hyp: int = 128,
                         thresh: float = 0.3 / 460.0):
    """Relative pose cam0 -> cam1 by essential-matrix RANSAC.

    The reference delegates to cv::findFundamentalMat(RANSAC, 0.3/460, 0.99)
    (solve_5pts.cpp:24-29); here all `n_hyp` minimal 8-point hypotheses are
    solved as ONE batched SVD and scored in parallel.

    Args:
      key: PRNG key. p0, p1: (N, 2) normalized correspondences. mask: (N,)
      bool validity. Returns (R (3,3), t (3,), inliers (N,) bool) with
      R, t mapping cam0 coords to cam1: x1 ~ R x0 + t.
    """
    N = p0.shape[0]
    w = mask.astype(jnp.float32) + 1e-9
    idx = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(8,), replace=False, p=w / w.sum())
    )(jax.random.split(key, n_hyp))                       # (H, 8)

    Es = jax.vmap(lambda ii: _eight_point(p0[ii], p1[ii]))(idx)
    d2 = jax.vmap(lambda E: _sampson_sq(E, p0, p1))(Es)   # (H, N)
    inl = (d2 < thresh * thresh) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    E = Es[best]
    inliers = inl[best]
    # refit on inliers via the weighted 8-point normal system
    x0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], axis=1)
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)
    Arows = jnp.einsum("ni,nj->nij", x1, x0).reshape(N, 9)
    Aw = Arows * inliers[:, None]
    _, _, Vt = jnp.linalg.svd(Aw, full_matrices=False)
    E2 = Vt[-1].reshape(3, 3)
    U, _, Vt2 = jnp.linalg.svd(E2)
    E2 = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E2.dtype)) @ Vt2
    R, t, _ = recover_pose(E2, p0, p1, inliers)
    return R, t, inliers


# ---------------------------------------------------------------------------
# Camera-IMU rotation calibration (reference: initial_ex_rotation.cpp)
# ---------------------------------------------------------------------------


def calibrate_ex_rotation(q_cam, q_imu, valid):
    """Solve R_ic from per-interval camera/IMU rotation pairs.

    q_cam[k]: camera-frame rotation (wxyz) between consecutive frames from
    epipolar geometry; q_imu[k]: same interval's IMU preintegrated rotation.
    valid: (K,) mask. Implements the stacked Qleft(q_cam) - Qright(q_imu)
    system with Huber angular weights, smallest-singular-vector solution
    (reference: CalibrationExRotation, initial_ex_rotation.cpp:22-81).

    Returns (q_ic (4,) wxyz, ok: smallest-gap criterion
    singular_values[2] > 0.25)."""
    K = q_cam.shape[0]
    dtype = q_cam.dtype

    def rows(qc, qi, m):
        # angular distance between qc and qi for the Huber weight
        d = lie.quat_mul(lie.quat_conj(qc), qi)
        ang = jnp.degrees(2.0 * jnp.arctan2(
            jnp.linalg.norm(d[1:]), jnp.abs(d[0])))
        huber = jnp.where(ang > 5.0, 5.0 / jnp.maximum(ang, 1e-9), 1.0)
        L = lie.quat_left(qc)
        R = lie.quat_right(qi)
        return huber * m * (L - R)                        # (4, 4)

    A = jax.vmap(rows)(q_cam, q_imu,
                       valid.astype(dtype)).reshape(4 * K, 4)
    _, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    qn = Vt[-1]                                           # (4,) wxyz; solves
    # q_cam = qn q_imu qn^-1, i.e. qn = q_ic^-1 — invert like the reference's
    # final `.inverse()` (initial_ex_rotation.cpp:73-76)
    q = lie.quat_conj(qn)
    q = q * jnp.sign(q[0])
    q = q / jnp.linalg.norm(q)
    ok = s[2] > 0.25
    return q, ok


# ---------------------------------------------------------------------------
# Global SfM (reference: initial_sfm.cpp construct())
# ---------------------------------------------------------------------------


class SfmResult(NamedTuple):
    q: jax.Array        # (NF, 4) world->frame... frame poses, wxyz, cam-to-world
    p: jax.Array        # (NF, 3) camera centers in world (frame l) coords
    pts: jax.Array      # (F, 3) triangulated landmarks, world coords
    pts_ok: jax.Array   # (F,) bool
    ok: jax.Array       # () bool overall success


def _pnp_gn(q0, p0, pts_w, obs, m, iters: int = 10):
    """Gauss-Newton PnP: refine camera-from-world (q, p as camera center)
    minimizing masked reprojection error. pts_w (N,3), obs (N,2), m (N,)."""
    dtype = pts_w.dtype

    def residual(delta, q, p):
        qq = lie.quat_normalize(lie.quat_mul(q, lie.delta_q(delta[3:6])))
        pp = p + delta[0:3]
        pc = jax.vmap(lambda X: lie.quat_rotate(lie.quat_conj(qq), X - pp))(pts_w)
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        r = (pc[:, :2] / z[:, None] - obs) * m[:, None]
        return r.reshape(-1)

    def body(_, carry):
        q, p = carry
        zero = jnp.zeros((6,), dtype)
        r = residual(zero, q, p)
        J = jax.jacfwd(residual)(zero, q, p)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=dtype)
        dx = -jnp.linalg.solve(H, J.T @ r)
        q2 = lie.quat_normalize(lie.quat_mul(q, lie.delta_q(dx[3:6])))
        return q2, p + dx[0:3]

    return jax.lax.fori_loop(0, iters, body, (q0, p0))


def _triangulate_two_world(q0, p0, q1, p1, a, b):
    """DLT of one point from two world-frame camera poses (cam centers p,
    cam-to-world rotations q), normalized obs a, b."""
    R0 = lie.quat_to_rot(q0).T
    R1 = lie.quat_to_rot(q1).T
    P0 = jnp.concatenate([R0, (-R0 @ p0)[:, None]], axis=1)
    P1 = jnp.concatenate([R1, (-R1 @ p1)[:, None]], axis=1)
    A = jnp.stack([
        a[0] * P0[2] - P0[0],
        a[1] * P0[2] - P0[1],
        b[0] * P1[2] - P1[0],
        b[1] * P1[2] - P1[1],
    ])
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[-1]
    return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])


@partial(jax.jit, static_argnames=("l", "ba_iters"))
def global_sfm(l, q_l_to_last, p_l_to_last, f_pts, f_obs, ba_iters: int = 15):
    """Windowed mono SfM (reference: GlobalSFM::construct, initial_sfm.cpp).

    Frame l is the gauge (identity); the newest frame's pose relative to l is
    given (from relative_pose_ransac). Pipeline — all fixed-shape, masked:
      1. triangulate features seen in (l, last)
      2. PnP each frame l+1..last-1 from current structure, triangulate more
         (forward chain), then PnP l-1..0 (backward chain)
      3. triangulate everything remaining
      4. full bundle adjustment (GN, frames l fixed + last position-fixed up
         to scale like the reference keeps it constant)

    Args:
      l: static int — seed frame index.
      q_l_to_last, p_l_to_last: relative pose of the newest frame in l coords.
      f_pts: (F, NF, 2) normalized observations. f_obs: (F, NF) bool.
    Returns SfmResult (poses cam-to-world in frame-l gauge).
    """
    F, NF = f_obs.shape
    dtype = f_pts.dtype

    q = jnp.tile(lie.quat_identity(dtype), (NF, 1))
    p = jnp.zeros((NF, 3), dtype)
    q = q.at[NF - 1].set(q_l_to_last)
    p = p.at[NF - 1].set(p_l_to_last)

    pts = jnp.zeros((F, 3), dtype)
    pts_ok = jnp.zeros((F,), bool)

    def tri_pair(i, j, q, p, pts, pts_ok):
        """Triangulate all features seen in frames i and j, not yet solved."""
        can = f_obs[:, i] & f_obs[:, j] & jnp.logical_not(pts_ok)
        new = jax.vmap(lambda a, b: _triangulate_two_world(
            q[i], p[i], q[j], p[j], a, b))(f_pts[:, i], f_pts[:, j])
        # sanity: in front of both cameras
        zi = jax.vmap(lambda X: lie.quat_rotate(lie.quat_conj(q[i]), X - p[i])[2])(new)
        zj = jax.vmap(lambda X: lie.quat_rotate(lie.quat_conj(q[j]), X - p[j])[2])(new)
        good = can & (zi > 0.05) & (zj > 0.05)
        pts = jnp.where(good[:, None], new, pts)
        return pts, pts_ok | good

    pts, pts_ok = tri_pair(l, NF - 1, q, p, pts, pts_ok)

    def pnp_frame(i, q, p, pts, pts_ok, init_q, init_p):
        m = (f_obs[:, i] & pts_ok).astype(dtype)
        qi, pi = _pnp_gn(init_q, init_p, pts, f_pts[:, i], m)
        enough = jnp.sum(m) >= 6
        qi = jnp.where(enough, qi, init_q)
        pi = jnp.where(enough, pi, init_p)
        return q.at[i].set(qi), p.at[i].set(pi)

    # forward chain l+1 .. NF-2 (seed from previous frame), triangulate vs last
    def fwd(i, carry):
        q, p, pts, pts_ok = carry
        do = (i > l) & (i < NF - 1)

        def yes(args):
            q, p, pts, pts_ok = args
            q2, p2 = pnp_frame(i, q, p, pts, pts_ok, q[i - 1], p[i - 1])
            pts2, ok2 = tri_pair(i, NF - 1, q2, p2, pts, pts_ok)
            return q2, p2, pts2, ok2

        return jax.lax.cond(do, yes, lambda a: a, (q, p, pts, pts_ok))

    q, p, pts, pts_ok = jax.lax.fori_loop(0, NF, fwd, (q, p, pts, pts_ok))
    # triangulate everything seen in (l, i)
    def tri_l(i, carry):
        pts, pts_ok = carry
        do = (i > l) & (i < NF - 1)
        return jax.lax.cond(
            do, lambda a: tri_pair(l, i, q, p, a[0], a[1]),
            lambda a: a, (pts, pts_ok))
    pts, pts_ok = jax.lax.fori_loop(0, NF, tri_l, (pts, pts_ok))

    # backward chain l-1 .. 0, triangulate vs l
    def bwd(k, carry):
        q, p, pts, pts_ok = carry
        i = l - 1 - k

        def yes(args):
            q, p, pts, pts_ok = args
            q2, p2 = pnp_frame(i, q, p, pts, pts_ok, q[i + 1], p[i + 1])
            pts2, ok2 = tri_pair(i, l, q2, p2, pts, pts_ok)
            return q2, p2, pts2, ok2

        return jax.lax.cond(i >= 0, yes, lambda a: a, (q, p, pts, pts_ok))

    q, p, pts, pts_ok = jax.lax.fori_loop(0, NF, bwd, (q, p, pts, pts_ok))

    # triangulate any feature with >= 2 solved-frame observations (first/last)
    first = jnp.argmax(f_obs, axis=1)
    rev = jnp.argmax(f_obs[:, ::-1], axis=1)
    last = NF - 1 - rev
    can = jnp.logical_not(pts_ok) & (jnp.sum(f_obs, axis=1) >= 2)
    new = jax.vmap(lambda i, j, a, b: _triangulate_two_world(
        q[i], p[i], q[j], p[j], a, b))(
        first, last, f_pts[jnp.arange(F), first], f_pts[jnp.arange(F), last])
    zi = jax.vmap(lambda i, X: lie.quat_rotate(
        lie.quat_conj(q[i]), X - p[i])[2])(first, new)
    zl = jax.vmap(lambda j, X: lie.quat_rotate(
        lie.quat_conj(q[j]), X - p[j])[2])(last, new)
    good = can & (zi > 0.05) & (zl > 0.05)
    pts = jnp.where(good[:, None], new, pts)
    pts_ok = pts_ok | good

    # ---- bundle adjustment: frames + points, frame l fixed, frame-last
    # translation fixed (scale gauge), masked GN ----
    def ba_residual(dq_all, dp_all, dX):
        qq = jax.vmap(lambda a, b: lie.quat_normalize(
            lie.quat_mul(a, lie.delta_q(b))))(q_ba, dq_all)
        pp = p_ba + dp_all
        X = pts_ba + dX

        def per_obs(f, i):
            pc = lie.quat_rotate(lie.quat_conj(qq[i]), X[f] - pp[i])
            z = jnp.where(jnp.abs(pc[2]) < 1e-6, 1e-6, pc[2])
            r = pc[:2] / z - f_pts[f, i]
            return jnp.where(f_obs[f, i] & pts_ok[f], r, 0.0)

        fi = jnp.repeat(jnp.arange(F), NF)
        ii = jnp.tile(jnp.arange(NF), F)
        return jax.vmap(per_obs)(fi, ii).reshape(-1)

    q_ba, p_ba, pts_ba = q, p, pts

    def ba_step(_, carry):
        q_c, p_c, X_c = carry

        def res(vec):
            dq = vec[: 3 * NF].reshape(NF, 3)
            dp = vec[3 * NF: 6 * NF].reshape(NF, 3)
            dX = vec[6 * NF:].reshape(F, 3)
            qq = jax.vmap(lambda a, b: lie.quat_normalize(
                lie.quat_mul(a, lie.delta_q(b))))(q_c, dq)
            pp = p_c + dp
            X = X_c + dX

            def per_obs(f, i):
                pc = lie.quat_rotate(lie.quat_conj(qq[i]), X[f] - pp[i])
                z = jnp.where(jnp.abs(pc[2]) < 1e-6, 1e-6, pc[2])
                r = pc[:2] / z - f_pts[f, i]
                return jnp.where(f_obs[f, i] & pts_ok[f], r, 0.0)

            fi = jnp.repeat(jnp.arange(F), NF)
            ii = jnp.tile(jnp.arange(NF), F)
            return jax.vmap(per_obs)(fi, ii).reshape(-1)

        dim = 6 * NF + 3 * F
        zero = jnp.zeros((dim,), dtype)
        r0 = res(zero)
        J = jax.jacfwd(res)(zero)
        # gauge: freeze frame l fully + frame last translation (scale)
        free = jnp.ones((dim,), dtype)
        free = free.at[3 * l: 3 * l + 3].set(0.0)            # dq_l
        free = free.at[3 * NF + 3 * l: 3 * NF + 3 * l + 3].set(0.0)  # dp_l
        free = free.at[3 * NF + 3 * (NF - 1): 3 * NF + 3 * NF].set(0.0)
        # frozen points stay frozen
        ptfree = jnp.repeat(pts_ok.astype(dtype), 3)
        free = free.at[6 * NF:].set(ptfree)
        J = J * free[None, :]
        H = J.T @ J + 1e-6 * jnp.eye(dim, dtype=dtype)
        dx = -jnp.linalg.solve(H, J.T @ r0) * free
        dq = dx[: 3 * NF].reshape(NF, 3)
        dp = dx[3 * NF: 6 * NF].reshape(NF, 3)
        dX = dx[6 * NF:].reshape(F, 3)
        q2 = jax.vmap(lambda a, b: lie.quat_normalize(
            lie.quat_mul(a, lie.delta_q(b))))(q_c, dq)
        return q2, p_c + dp, X_c + dX

    q_f, p_f, pts_f = jax.lax.fori_loop(0, ba_iters, ba_step,
                                        (q_ba, p_ba, pts_ba))
    ok = jnp.sum(pts_ok) >= 10
    return SfmResult(q=q_f, p=p_f, pts=pts_f, pts_ok=pts_ok, ok=ok)


# ---------------------------------------------------------------------------
# Visual-IMU alignment (reference: initial_aligment.cpp:126-293)
# ---------------------------------------------------------------------------


def _tangent_basis(g):
    """Two unit vectors spanning the plane orthogonal to g
    (reference: TangentBasis, initial_aligment.cpp:190-205)."""
    a = g / jnp.linalg.norm(g)
    tmp = jnp.where(jnp.abs(a[0]) > 0.9,
                    jnp.asarray([0.0, 0.0, 1.0], g.dtype),
                    jnp.asarray([1.0, 0.0, 0.0], g.dtype))
    b = tmp - a * (a @ tmp)
    b = b / jnp.linalg.norm(b)
    c = jnp.cross(a, b)
    return b, c


def visual_imu_alignment(p_c, q_c, dp, dv, dt, tic, ric, g_norm: float,
                         refine_iters: int = 4):
    """Solve velocities, gravity, and metric scale aligning an up-to-scale
    camera trajectory with IMU preintegration (reference: LinearAlignment +
    RefineGravity, initial_aligment.cpp:126-293).

    Args:
      p_c: (K+1, 3) camera centers (SfM, frame-l gauge, arbitrary scale);
      q_c: (K+1, 4) body-to-reference rotations (SfM x extrinsic);
      dp, dv: (K, 3) IMU preintegrated deltas between consecutive frames;
      dt: (K,) interval durations; tic/ric: camera extrinsics; g_norm: |g|.
    Returns (v (K+1, 3) body-frame velocities, g_ref (3,), scale ()) and
    `ok` (scale > 0 like the reference's s < 0 failure check).
    """
    K = dp.shape[0]
    dtype = dp.dtype
    n = 3 * (K + 1) + 3 + 1

    R = jax.vmap(lie.quat_to_rot)(q_c)                     # (K+1, 3, 3)

    def build(g_fix=None, basis=None):
        gdim = 3 if basis is None else 2
        m = 3 * (K + 1) + gdim + 1
        A = jnp.zeros((m, m), dtype)
        b = jnp.zeros((m,), dtype)

        I3 = jnp.eye(3, dtype=dtype)

        def block(k):
            H = jnp.zeros((6, m), dtype)
            z = jnp.zeros((6,), dtype)
            Ri_T = R[k].T
            dtk = dt[k]
            # rows 0:3 — position: dp = Ri^T(p_{k+1} - p_k) s ... (reference
            # form: -I dt v_i + Ri^T dt^2/2 g + Ri^T (pc_{k+1} - pc_k) s
            #        = dp + (terms with tic))
            H = jax.lax.dynamic_update_slice(H, -dtk * I3, (0, 3 * k))
            gcols = Ri_T * (dtk * dtk / 2)
            scol = Ri_T @ (p_c[k + 1] - p_c[k]) / 100.0
            if basis is None:
                H = H.at[0:3, 3 * (K + 1): 3 * (K + 1) + 3].set(gcols)
            else:
                H = H.at[0:3, 3 * (K + 1): 3 * (K + 1) + 2].set(gcols @ basis)
            H = H.at[0:3, m - 1].set(scol)
            zp = dp[k] + Ri_T @ R[k + 1] @ tic - tic
            if basis is not None:
                zp = zp - gcols @ g_fix
            z = z.at[0:3].set(zp)
            # rows 3:6 — velocity: -I v_i + Ri^T R_{k+1} v_{k+1} + Ri^T dt g = dv
            H = jax.lax.dynamic_update_slice(H, -I3, (3, 3 * k))
            H = jax.lax.dynamic_update_slice(H, Ri_T @ R[k + 1],
                                             (3, 3 * (k + 1)))
            gcols2 = Ri_T * dtk
            if basis is None:
                H = H.at[3:6, 3 * (K + 1): 3 * (K + 1) + 3].set(gcols2)
            else:
                H = H.at[3:6, 3 * (K + 1): 3 * (K + 1) + 2].set(gcols2 @ basis)
            zv = dv[k]
            if basis is not None:
                zv = zv - gcols2 @ g_fix
            z = z.at[3:6].set(zv)
            return H.T @ H, H.T @ z

        Hs, bs = jax.vmap(block)(jnp.arange(K))
        A = jnp.sum(Hs, axis=0)
        b = jnp.sum(bs, axis=0)
        A = A * 1000.0 + 1e-10 * jnp.eye(m, dtype=dtype)
        b = b * 1000.0
        x = jnp.linalg.solve(A, b)
        return x

    x = build()
    g = x[3 * (K + 1): 3 * (K + 1) + 3]
    s = x[-1] / 100.0

    # refine gravity on its 2-dim tangent with |g| fixed
    def refine(_, g):
        g0 = g / jnp.linalg.norm(g) * g_norm
        b1, b2 = _tangent_basis(g0)
        basis = jnp.stack([b1, b2], axis=1)                # (3, 2)
        x = build(g_fix=g0, basis=basis)
        dg = x[3 * (K + 1): 3 * (K + 1) + 2]
        return g0 + basis @ dg

    g = jax.lax.fori_loop(0, refine_iters, refine, g)
    g = g / jnp.linalg.norm(g) * g_norm

    # final solve at refined gravity for velocities and scale
    b1, b2 = _tangent_basis(g)
    basis = jnp.stack([b1, b2], axis=1)
    x = build(g_fix=g, basis=basis)
    v = x[: 3 * (K + 1)].reshape(K + 1, 3)
    s = x[-1] / 100.0
    ok = s > 0
    return v, g, s, ok

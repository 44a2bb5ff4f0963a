"""Tests for the monocular initialization machinery
(reference: src/initial/ — solve_5pts, initial_ex_rotation, initial_sfm,
initial_aligment.cpp LinearAlignment/RefineGravity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.estimator import initial_sfm as isfm
from cerberus_tpu.utils import lie


def _rand_rot(rng, scale=0.3):
    v = rng.normal(size=3) * scale
    return np.asarray(lie.quat_to_rot(lie.so3_exp_quat(jnp.asarray(v))))


def _project(R_wc, t_wc, X):
    """World->cam R (cam-from-world), camera center t. X: (N, 3)."""
    pc = (X - t_wc) @ R_wc
    return pc[:, :2] / pc[:, 2:3], pc[:, 2]


class TestRelativePose:
    def test_recovers_rotation_translation(self, rng):
        N = 80
        X = rng.uniform([-3, -3, 4], [3, 3, 12], size=(N, 3))
        R = _rand_rot(rng, 0.2)        # cam1-from-cam0
        t = np.array([0.4, -0.1, 0.15])
        p0, z0 = _project(np.eye(3), np.zeros(3), X)
        # x1 = R x0 + t: cam1 center in cam0 coords is -R^T t
        p1, z1 = _project(R.T, -R.T @ t, X)
        noise = 0.15 / 460.0
        p0 += rng.normal(size=p0.shape) * noise
        p1 += rng.normal(size=p1.shape) * noise
        mask = (z0 > 0) & (z1 > 0)

        Re, te, inl = isfm.relative_pose_ransac(
            jax.random.PRNGKey(0), jnp.asarray(p0), jnp.asarray(p1),
            jnp.asarray(mask))
        Re, te = np.asarray(Re), np.asarray(te)
        ang = np.degrees(np.arccos(np.clip((np.trace(Re @ R.T) - 1) / 2,
                                           -1, 1)))
        assert ang < 1.0, ang
        cos = abs(te @ t) / (np.linalg.norm(te) * np.linalg.norm(t))
        assert cos > 0.995, (te, t)
        assert int(np.asarray(inl).sum()) > 0.8 * N


class TestExRotationCalibration:
    def test_recovers_ric(self, rng):
        q_ic_true = np.asarray(lie.so3_exp_quat(
            jnp.asarray([0.2, -0.5, 0.15])))
        K = 30
        q_cam, q_imu = [], []
        for _ in range(K):
            qb = lie.so3_exp_quat(jnp.asarray(rng.normal(size=3) * 0.2))
            # q_cam = q_ic^-1 q_imu q_ic  (camera rotation between frames)
            qc = lie.quat_mul(lie.quat_conj(jnp.asarray(q_ic_true)),
                              lie.quat_mul(qb, jnp.asarray(q_ic_true)))
            q_imu.append(np.asarray(qb))
            q_cam.append(np.asarray(qc))
        q, ok = isfm.calibrate_ex_rotation(
            jnp.asarray(np.stack(q_cam)), jnp.asarray(np.stack(q_imu)),
            jnp.ones(K, bool))
        q = np.asarray(q)
        assert bool(ok)
        d = abs(float(np.dot(q, q_ic_true)))
        assert d > 0.9999, (q, q_ic_true)


class TestGlobalSFM:
    def test_reconstructs_window(self, rng):
        NF, F = 11, 60
        # camera trajectory: arc with yaw, cam-to-world poses
        ts = np.linspace(0, 1, NF)
        centers = np.stack([2.0 * ts, 0.3 * np.sin(2 * ts), 0 * ts], -1)
        qs = []
        for k in range(NF):
            qs.append(np.asarray(lie.so3_exp_quat(
                jnp.asarray([0.02 * k, 0.03 * k, 0.1 * k]))))
        qs = np.stack(qs)
        Rs = np.stack([np.asarray(lie.quat_to_rot(jnp.asarray(qk)))
                       for qk in qs])
        X = rng.uniform([-4, -4, 3], [8, 4, 10], size=(F, 3))

        f_pts = np.zeros((F, NF, 2))
        f_obs = np.zeros((F, NF), bool)
        for i in range(NF):
            pc = (X - centers[i]) @ Rs[i]          # world -> cam_i
            ok = pc[:, 2] > 0.5
            f_pts[ok, i] = pc[ok, :2] / pc[ok, 2:3]
            f_obs[:, i] = ok
        f_pts += rng.normal(size=f_pts.shape) * (0.3 / 460.0)

        l = 0
        # relative pose of newest frame in l coords (gauge: frame l = I at 0)
        Rl, cl = Rs[l], centers[l]
        q_rel = np.asarray(lie.rot_to_quat(jnp.asarray(Rl.T @ Rs[-1])))
        p_rel = Rl.T @ (centers[-1] - cl)

        res = isfm.global_sfm(l, jnp.asarray(q_rel), jnp.asarray(p_rel),
                              jnp.asarray(f_pts), jnp.asarray(f_obs))
        assert bool(res.ok)
        p_est = np.asarray(res.p)
        # ground truth in frame-l gauge
        p_gt = (centers - cl) @ Rl
        err = np.linalg.norm(p_est - p_gt, axis=1)
        assert err.max() < 0.05, err
        # triangulated points accuracy (world = frame-l coords)
        ok = np.asarray(res.pts_ok)
        X_gt = (X - cl) @ Rl
        pt_err = np.linalg.norm(np.asarray(res.pts)[ok] - X_gt[ok], axis=1)
        assert np.median(pt_err) < 0.05, np.median(pt_err)
        assert ok.sum() >= 0.8 * F


class TestVisualIMUAlignment:
    def test_recovers_scale_gravity_velocity(self, rng):
        K = 10
        dt = np.full(K, 0.3)
        g_w = np.array([0.0, 0.0, 9.805])
        scale_true = 2.7
        # body trajectory with rotation
        q = [np.array([1.0, 0, 0, 0])]
        for k in range(K):
            dq = lie.so3_exp_quat(jnp.asarray(rng.normal(size=3) * 0.15))
            q.append(np.asarray(lie.quat_mul(jnp.asarray(q[-1]), dq)))
        q = np.stack(q)
        v = rng.normal(size=(K + 1, 3)) * 0.5       # world velocities
        p = np.zeros((K + 1, 3))
        dp, dv = np.zeros((K, 3)), np.zeros((K, 3))
        for k in range(K):
            a_w = (v[k + 1] - v[k]) / dt[k]
            p[k + 1] = p[k] + v[k] * dt[k] + 0.5 * a_w * dt[k] ** 2
            Rk = np.asarray(lie.quat_to_rot(jnp.asarray(q[k])))
            # preintegrated deltas (world gravity removed)
            dp[k] = Rk.T @ (p[k + 1] - p[k] - v[k] * dt[k]
                            + 0.5 * g_w * dt[k] ** 2)
            dv[k] = Rk.T @ (v[k + 1] - v[k] + g_w * dt[k])

        tic = np.array([0.1, 0.02, -0.03])
        ric = np.eye(3)
        # camera centers: scaled positions plus extrinsic lever arm,
        # matching the reference model  s p_c = p_b + R_b tic  (up to gauge)
        Rb = np.stack([np.asarray(lie.quat_to_rot(jnp.asarray(qk)))
                       for qk in q])
        p_c = (p + np.einsum("kij,j->ki", Rb, tic)) / scale_true

        v_est, g_est, s_est, ok = isfm.visual_imu_alignment(
            jnp.asarray(p_c), jnp.asarray(q), jnp.asarray(dp),
            jnp.asarray(dv), jnp.asarray(dt), jnp.asarray(tic),
            jnp.asarray(ric), 9.805)
        assert bool(ok)
        assert abs(float(s_est) - scale_true) < 0.02 * scale_true, s_est
        assert np.linalg.norm(np.asarray(g_est) - g_w) < 0.05, g_est
        # velocities are solved in body frame: v_world = R_b v_body
        v_w = np.einsum("kij,kj->ki", Rb, np.asarray(v_est))
        assert np.abs(v_w - v).max() < 0.05, np.abs(v_w - v).max()

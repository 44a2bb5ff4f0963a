"""Pose-graph loop-closure tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.loop import PoseGraph, optimize_pose_graph
from cerberus_tpu.loop.posegraph import _np_rot_z


def make_square_loop(n_per_side=10, drift_per_step=0.01, seed=0):
    """Ground-truth square trajectory; odometry with accumulating drift."""
    rng = np.random.default_rng(seed)
    gt_p, gt_yaw = [np.zeros(3)], [0.0]
    for side in range(4):
        for _ in range(n_per_side):
            yaw = side * np.pi / 2
            step = _np_rot_z(yaw) @ np.array([0.5, 0, 0])
            gt_p.append(gt_p[-1] + step)
            gt_yaw.append(yaw)
    gt_p = np.array(gt_p)
    gt_yaw = np.array(gt_yaw)
    N = len(gt_p)

    # drifting odometry estimates
    est_p = [gt_p[0]]
    est_yaw = [gt_yaw[0]]
    rels = []
    for k in range(1, N):
        Ri = _np_rot_z(gt_yaw[k - 1])
        rel_p = Ri.T @ (gt_p[k] - gt_p[k - 1]) + rng.normal(size=3) * drift_per_step
        rel_yaw = gt_yaw[k] - gt_yaw[k - 1] + rng.normal() * drift_per_step
        rels.append((rel_p, rel_yaw))
        Re = _np_rot_z(est_yaw[-1])
        est_p.append(est_p[-1] + Re @ rel_p)
        est_yaw.append(est_yaw[-1] + rel_yaw)
    return gt_p, gt_yaw, np.array(est_p), np.array(est_yaw), rels


def test_loop_closure_reduces_drift():
    gt_p, gt_yaw, est_p, est_yaw, rels = make_square_loop()
    N = len(gt_p)
    # edges: sequential odometry + one loop edge closing the square
    e_i = np.array([k for k in range(N - 1)] + [0], np.int32)
    e_j = np.array([k + 1 for k in range(N - 1)] + [N - 1], np.int32)
    rel_p = np.array([r[0] for r in rels] + [gt_p[N - 1] - gt_p[0]])
    rel_yaw = np.array([r[1] for r in rels] + [gt_yaw[N - 1] - gt_yaw[0]])
    e_w = np.concatenate([np.full(N - 1, 1.0), [20.0]])
    e_mask = np.ones(N, bool)

    drift_before = np.linalg.norm(est_p[-1] - gt_p[-1])
    p_opt, yaw_opt = optimize_pose_graph(
        jnp.asarray(est_p), jnp.asarray(est_yaw), jnp.asarray(e_i),
        jnp.asarray(e_j), jnp.asarray(rel_p), jnp.asarray(rel_yaw),
        jnp.asarray(e_w), jnp.asarray(e_mask), iters=10)
    drift_after = np.linalg.norm(np.asarray(p_opt)[-1] - gt_p[-1])
    assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
    # gauge: node 0 unchanged
    np.testing.assert_allclose(np.asarray(p_opt)[0], est_p[0], atol=1e-9)


@pytest.mark.slow
def test_posegraph_database_detects_loops():
    pg = PoseGraph(min_overlap=5, min_gap=8)
    # walk out and back; features at each end shared
    ids_home = set(range(100, 130))
    for k in range(20):
        ids = ids_home if k < 3 else set(range(1000 + 40 * k, 1000 + 40 * k + 30))
        pg.add_keyframe(np.array([0.5 * k, 0, 0]), 0.0, ids)
    n_edges_before = len(pg.edges)
    # revisit home features -> loop edge to an early keyframe
    pg.add_keyframe(np.array([10.5, 0.3, 0]), 0.0, ids_home)
    assert len(pg.edges) == n_edges_before + 2  # sequential + loop
    pg.optimize(iters=4)
    assert np.isfinite(pg.p[: pg.n]).all()


@pytest.mark.slow
def test_estimator_feeds_posegraph():
    """Integration: the estimator's keyframe_callback (the capability of the
    reference's keyframe pose/point publishers, visualization.cpp:345-398)
    streams marginalized keyframes into the PoseGraph back-end."""
    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.replay import replay
    from cerberus_tpu.estimator.estimator import Estimator
    from cerberus_tpu.utils import lie

    pg = PoseGraph(min_overlap=5, min_gap=8)
    est = Estimator(EstimatorConfig())

    def on_keyframe(t, p, q, ids, obs):
        yaw = float(np.deg2rad(
            np.asarray(lie.rot_to_ypr(lie.quat_to_rot(jnp.asarray(q))))[0]))
        pg.add_keyframe(p, yaw, ids)

    est.keyframe_callback = on_keyframe
    sim = simulate(SimConfig(duration=3.0, speed=0.5, seed=5))
    out = replay(sim, est=est, max_frames=20)
    assert est.solver_flag == est.NON_LINEAR
    assert pg.n >= 5                       # marg_old keyframes streamed in
    assert len(pg.edges) >= pg.n - 1       # sequential edges formed
    pg.optimize(iters=4)
    assert np.isfinite(pg.p[: pg.n]).all()


@pytest.mark.slow
def test_pose_graph_save_load_roundtrip(tmp_path):
    """Pose-graph persistence (reference: loop_fusion pose_graph_save_path,
    a1 yaml:101-104): save -> load -> optimize reproduces the same states."""
    from cerberus_tpu.loop.posegraph import (load_pose_graph,
                                             save_pose_graph)
    pg = PoseGraph(min_overlap=5, min_gap=8, auto_detect=False)
    for k in range(12):
        pg.add_keyframe(np.array([0.5 * k, 0.05 * k, 0]), 0.02 * k)
    pg.add_loop_edge(1, 11, rel_p=np.array([5.0, 0.4, 0]), rel_yaw=0.2,
                     weight=20.0)
    path = str(tmp_path / "pg.npz")
    save_pose_graph(pg, path)
    pg2 = load_pose_graph(path)
    assert pg2.n == pg.n and len(pg2.edges) == len(pg.edges)
    assert pg2.n_loop_edges == 1
    np.testing.assert_allclose(pg2.p[: pg2.n], pg.p[: pg.n])
    pg.optimize(iters=8)
    pg2.optimize(iters=8)
    np.testing.assert_allclose(pg2.p[: pg2.n], pg.p[: pg.n], atol=1e-8)
    np.testing.assert_allclose(pg2.yaw[: pg2.n], pg.yaw[: pg.n], atol=1e-8)

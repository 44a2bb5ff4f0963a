"""Metrics stream + visualization outputs (SURVEY §5 observability,
§2.18 visualization — the reference's printf/ROS/rviz surface)."""

import numpy as np

from cerberus_tpu.utils.metrics import MetricsLogger, read_metrics
from cerberus_tpu.utils.viz import draw_tracks, plot_metrics, plot_trajectory


def test_metrics_roundtrip(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p, flush_every=2)
    m.log("solve", t=0.1, cost0=10.0, cost=2.0, solve_ms=33.0)
    m.log("solve", t=0.2, cost0=np.float32(8.0), cost=1.5, solve_ms=30.0)
    m.log("reboot", t=0.3, count=1)
    m.close()
    recs = read_metrics(p)
    assert [r["kind"] for r in recs] == ["solve", "solve", "reboot"]
    assert recs[1]["cost0"] == 8.0          # numpy scalars serialized
    assert all("wall_s" in r for r in recs)


def test_plot_outputs(tmp_path):
    n = 40
    est = np.cumsum(np.random.default_rng(0).normal(size=(n, 3)) * 0.1, 0)
    gt = est + 0.05
    p1 = plot_trajectory(est, gt, str(tmp_path / "traj.png"),
                         extra={"loop": est * 0.99})
    assert (tmp_path / "traj.png").exists()

    m = MetricsLogger(str(tmp_path / "m.jsonl"))
    for i in range(10):
        m.log("solve", t=0.1 * i, cost0=10.0, cost=2.0, solve_ms=30 + i)
    m.log("reboot", t=0.55, count=1)
    m.close()
    p2 = plot_metrics(str(tmp_path / "m.jsonl"), str(tmp_path / "met.png"))
    assert (tmp_path / "met.png").exists()


def test_draw_tracks():
    img = np.zeros((60, 80), np.uint8)
    pts = np.array([[10.0, 10.0], [40.0, 30.0]])
    cnt = np.array([1, 30])
    vis = draw_tracks(img, pts, cnt, predictions=np.array([[20.0, 20.0]]))
    assert vis.shape == (60, 80, 3)
    assert vis.sum() > 0

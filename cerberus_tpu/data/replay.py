"""Replay driver: stream a dataset through the estimator and evaluate drift.

The reference's integration test is rosbag replay with CSV output every 50
frames (reference: main.cpp:95-202); here the simulator (or a packed dataset)
is streamed sample-by-sample through `Estimator` and the trajectory is scored
against ground truth: ATE RMSE and drift % of distance traveled — the
headline Cerberus metric (README.md:4, <1 % drift).
"""

from __future__ import annotations

import os

import numpy as np

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.estimator.estimator import Estimator


def replay(sim: dict, cfg: EstimatorConfig | None = None,
           est: Estimator | None = None, max_frames: int | None = None,
           csv_path: str | None = None, ekf=None) -> dict:
    """Feed simulator output through the estimator.

    Returns dict with est_t, est_p, est_q, gt_p, ate_rmse, drift_pct,
    distance, and the estimator instance. With csv_path set, writes the
    reference's 20-column result schema (reference: main.cpp:152-197):
    [t_ns, p_wr(3), v_wr(3), ekf_pos(3), ekf_vel(3), gt_pos(3), rho(4)].
    If `ekf` (LeggedEKF) is given it is run alongside at sensor rate and its
    state fills columns 8-13 (else zeros).
    """
    est = est or Estimator(cfg)
    t = sim["t"]
    if "cam_idx" not in sim:
        # proprioception-only log (no cam.csv / features.npz): synthesize
        # the keyframe clock at the configured camera rate so the IMU+leg
        # window pipeline still runs (reference equivalent: VILO with
        # vision disabled)
        rate = float(sim.get("meta", {}).get("cam_rate", 15.0)) or 15.0
        cam_t = np.arange(t[0], t[-1], 1.0 / rate)
        sim = dict(sim, cam_t=cam_t,
                   cam_idx=np.clip(np.searchsorted(t, cam_t), 0, len(t) - 1))
    if "features" not in sim:
        sim = dict(sim, features=[{} for _ in sim["cam_idx"]])
    cam_idx = set(int(i) for i in sim["cam_idx"])
    cam_lookup = {int(k): f for k, f in zip(sim["cam_idx"], sim["features"])}
    if max_frames is not None:
        allowed = sorted(cam_idx)[:max_frames]
        cam_idx = set(allowed)

    est_t, est_p, est_q, gt_p = [], [], [], []
    writer = None
    if csv_path:
        header = ("t_ns,px,py,pz,vx,vy,vz,kf_px,kf_py,kf_pz,kf_vx,kf_vy,"
                  "kf_vz,gt_x,gt_y,gt_z,rho1,rho2,rho3,rho4")
        try:
            from cerberus_tpu.native import CsvWriter
            writer = CsvWriter(csv_path, header)
        except Exception:
            writer = _PyCsv(csv_path, header)
    # contact source selection (reference: main.cpp:319-330 switch on
    # CONTACT_SENSOR_TYPE): 0 = EKF contact probabilities (requires `ekf`),
    # 1 = plan/gait contacts, 2 = raw foot force (the preintegration's
    # sigmoid contact model consumes forces directly)
    ctype = est.cfg.contact_sensor_type
    for k in range(len(t)):
        if ekf is not None:
            if not ekf.is_inited():
                ekf.init_filter(t[k], sim["acc"][k], sim["gyr"][k],
                                sim["phi"][k])
            else:
                ekf.update_filter(t[k], sim["acc"][k], sim["gyr"][k],
                                  sim["phi"][k], dphi=sim["dphi"][k],
                                  foot_force=sim["foot_forces"][k])
        if ctype == 0 and ekf is not None and ekf.is_inited():
            contact = ekf.get_contacts()
        elif ctype == 2:
            contact = sim["foot_forces"][k]
        else:
            contact = sim["contacts"][k]
        est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                          sim["dphi"][k], contact)
        if k in cam_idx:
            est.input_image(t[k], cam_lookup[k])
            if est.solver_flag == Estimator.NON_LINEAR:
                p, q = est.pose
                est_t.append(t[k])
                est_p.append(p)
                est_q.append(q)
                gt_k = sim["p"][k] if "p" in sim else np.full(3, np.nan)
                gt_p.append(gt_k)
                if writer is not None:
                    kf = (ekf.get_state()[:6] if ekf is not None
                          and ekf.is_inited() else np.zeros(6))
                    writer.row([t[k] * 1e9, *p, *est.velocity, *kf[0:3],
                                *kf[3:6], *gt_k, *est.rho[-1]])

    est.flush()   # adopt the in-flight pipelined solve
    if writer is not None:
        writer.close()
    est_p = np.array(est_p) if est_p else np.zeros((0, 3))
    gt_p = np.array(gt_p) if gt_p else np.zeros((0, 3))

    metrics = score(est_p, gt_p)
    return dict(est_t=np.array(est_t), est_p=est_p, est_q=est_q, gt_p=gt_p,
                estimator=est, **metrics)


def replay_images(sim: dict, cfg=None, est: Estimator | None = None,
                  tracker=None, renderer=None, max_frames: int | None = None,
                  csv_path: str | None = None, ekf=None,
                  use_prediction: bool = True,
                  pipeline_frontend: bool = True) -> dict:
    """Full-pipeline replay: rendered stereo images -> feature tracker ->
    estimator — the reference's actual hot path (main.cpp:95-133
    sync_process -> inputImage -> trackImage -> processMeasurements),
    which plain `replay()` bypasses by injecting ideal features.

    tracker: FeatureTracker or DeviceTracker (anything with
      .track(t, img0, img1) -> feature dict and .set_prediction(pixels)).
      Defaults to the OpenCV front-end with the sim pinhole model.
    renderer: ImageRenderer (built from sim when None).
    pipeline_frontend: render+track frame k+1 on a worker thread while the
      estimator's deferred solve of frame k completes — the reference's own
      thread split (sync_process tracks while processMeasurements
      optimizes, main.cpp:478 + estimator.cpp:133-137). Prediction seeds
      then lag one extra frame (~3 px at walking speed).
    """
    from cerberus_tpu.data.simulator import ImageRenderer

    est = est or Estimator(cfg)
    if renderer is None:
        renderer = ImageRenderer(sim, est.cfg)
    if tracker is None:
        from cerberus_tpu.frontend.tracker import FeatureTracker, PinholeCamera
        f = renderer.f
        cams = [PinholeCamera(f, f, renderer.cx, renderer.cy,
                              size=(renderer.W, renderer.H))
                for _ in range(2)]
        tracker = FeatureTracker(cams[0], cams[1], max_cnt=est.cfg.max_cnt,
                                 min_dist=est.cfg.min_dist,
                                 flow_back=est.cfg.flow_back)

    if use_prediction:
        # estimator cam-frame predictions -> pixel seeds for the next track
        # (reference: predictPtsInNextFrame -> setPrediction,
        # estimator.cpp:1694-1739 + feature_tracker.cpp:501-518). The
        # pipelined front-end consumes the seed one frame late; extrapolating
        # a SECOND constant-velocity step to compensate was measured HARMFUL
        # (gait oscillation at ~2 Hz makes the extrapolation overshoot, and
        # the device LK has no retry-without-seed fallback like
        # feature_tracker.cpp:112-133): 120 s street A/B, device 0.86 % with
        # 2-step vs 0.27 % with 1-step; cv indifferent (0.46 vs 0.44) —
        # evals/diag_tracker_r5.json. Default stays 1; CERB_PREDICT_STEPS
        # overrides for experiments.
        est.predict_steps = int(os.environ.get("CERB_PREDICT_STEPS", "1"))
        f, cx, cy = renderer.f, renderer.cx, renderer.cy

        def _seed(pred_cam: dict):
            px = {}
            for fid, pc in pred_cam.items():
                if pc[2] > 0.1:
                    px[fid] = np.array([f * pc[0] / pc[2] + cx,
                                        f * pc[1] / pc[2] + cy])
            tracker.set_prediction(px)

        est.predict_callback = _seed

    t = sim["t"]
    cam_idx = set(int(i) for i in sim["cam_idx"])
    if max_frames is not None:
        cam_idx = set(sorted(cam_idx)[:max_frames])

    est_t, est_p, est_q, gt_p = [], [], [], []
    writer = None
    if csv_path:
        header = ("t_ns,px,py,pz,vx,vy,vz,kf_px,kf_py,kf_pz,kf_vx,kf_vy,"
                  "kf_vz,gt_x,gt_y,gt_z,rho1,rho2,rho3,rho4")
        try:
            from cerberus_tpu.native import CsvWriter
            writer = CsvWriter(csv_path, header)
        except Exception:
            writer = _PyCsv(csv_path, header)
    ctype = est.cfg.contact_sensor_type
    track_ms = 0.0
    render_ms = 0.0
    import time as _time

    cam_order = sorted(cam_idx)
    nxt = {cam_order[i]: cam_order[i + 1]
           for i in range(len(cam_order) - 1)}
    pool = fut = None
    if pipeline_frontend and cam_order:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)

        def produce(k):
            t0 = _time.time()
            img0, img1 = renderer.render_stereo(k)
            t1 = _time.time()
            feats = tracker.track(t[k], img0, img1)
            return feats, (t1 - t0) * 1000, (_time.time() - t1) * 1000

        fut = pool.submit(produce, cam_order[0])

    for k in range(len(t)):
        if ekf is not None:
            if not ekf.is_inited():
                ekf.init_filter(t[k], sim["acc"][k], sim["gyr"][k],
                                sim["phi"][k])
            else:
                ekf.update_filter(t[k], sim["acc"][k], sim["gyr"][k],
                                  sim["phi"][k], dphi=sim["dphi"][k],
                                  foot_force=sim["foot_forces"][k])
        if ctype == 0 and ekf is not None and ekf.is_inited():
            contact = ekf.get_contacts()
        elif ctype == 2:
            contact = sim["foot_forces"][k]
        else:
            contact = sim["contacts"][k]
        est.input_imu_leg(t[k], sim["acc"][k], sim["gyr"][k], sim["phi"][k],
                          sim["dphi"][k], contact)
        if k in cam_idx:
            if fut is not None:
                feats, r_ms, tk_ms = fut.result()
                render_ms += r_ms
                track_ms += tk_ms
                # start the NEXT frame's render+track before the estimator
                # blocks on its deferred fetch — front-end and back-end
                # overlap like the reference's sync_process/processThread
                if k in nxt:
                    fut = pool.submit(produce, nxt[k])
            else:
                t0 = _time.time()
                img0, img1 = renderer.render_stereo(k)
                t1 = _time.time()
                feats = tracker.track(t[k], img0, img1)
                t2 = _time.time()
                render_ms += (t1 - t0) * 1000
                track_ms += (t2 - t1) * 1000
            est.input_image(t[k], feats)
            if est.solver_flag == Estimator.NON_LINEAR:
                p, q = est.pose
                est_t.append(t[k])
                est_p.append(p)
                est_q.append(q)
                gt_k = sim["p"][k] if "p" in sim else np.full(3, np.nan)
                gt_p.append(gt_k)
                if writer is not None:
                    kf = (ekf.get_state()[:6] if ekf is not None
                          and ekf.is_inited() else np.zeros(6))
                    writer.row([t[k] * 1e9, *p, *est.velocity, *kf[0:3],
                                *kf[3:6], *gt_k, *est.rho[-1]])
    est.flush()   # adopt the in-flight pipelined solve
    if pool is not None:
        pool.shutdown(wait=True)
    if writer is not None:
        writer.close()
    est_p = np.array(est_p) if est_p else np.zeros((0, 3))
    gt_p = np.array(gt_p) if gt_p else np.zeros((0, 3))
    metrics = score(est_p, gt_p)
    n_frames = max(len(cam_idx), 1)
    return dict(est_t=np.array(est_t), est_p=est_p, est_q=est_q, gt_p=gt_p,
                estimator=est, tracker=tracker,
                render_ms_per_frame=render_ms / n_frames,
                track_ms_per_frame=track_ms / n_frames, **metrics)


class _PyCsv:
    """Pure-python fallback for the native CsvWriter."""

    def __init__(self, path, header):
        self.f = open(path, "w")
        self.f.write(header + "\n")

    def row(self, vals):
        self.f.write(",".join(f"{v:.9g}" for v in vals) + "\n")

    def close(self):
        self.f.close()


def score(est_p: np.ndarray, gt_p: np.ndarray) -> dict:
    """ATE/drift after 4-DoF alignment: first position + optimal yaw.

    Yaw is a gauge freedom of VIO/VILO — the estimator zeroes its initial
    yaw (g2R, reference: estimator.cpp:524-544) while ground truth starts at
    an arbitrary heading (e.g. the figure-8 sim starts at 45 deg), so the
    standard evaluation aligns a rotation about gravity before computing
    errors (same convention as the TUM/EVO 4-DoF ATE used for VIO)."""
    if len(est_p) < 2:
        return dict(ate_rmse=np.inf, drift_pct=np.inf, distance=0.0)
    if not np.all(np.isfinite(gt_p)):
        # logged dataset without ground truth (no mocap.csv): the replay
        # still runs and writes outputs, but accuracy is unscorable
        return dict(ate_rmse=np.nan, drift_pct=np.nan, distance=np.nan,
                    final_err=np.nan)
    # planar callers (e.g. ground-referenced EKF): pad each array to 3-D
    # based on its own width so a mismatched 2-col/3-col call fails loudly
    # below instead of silently producing a (N,4) stack
    if est_p.shape[1] == 2:
        est_p = np.column_stack([est_p, np.zeros(len(est_p))])
    if gt_p.shape[1] == 2:
        gt_p = np.column_stack([gt_p, np.zeros(len(gt_p))])
    assert est_p.shape[1] == gt_p.shape[1] == 3, \
        f"score(): shape mismatch est {est_p.shape} vs gt {gt_p.shape}"
    a = est_p - est_p[0]
    b = gt_p - gt_p[0]
    # closed-form yaw Procrustes about z: maximize sum of planar dot products
    num = float(np.sum(a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]))
    den = float(np.sum(a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]))
    th = np.arctan2(num, den)
    c, s = np.cos(th), np.sin(th)
    Rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    err = a @ Rz.T - b
    ate = float(np.sqrt(np.mean(np.sum(err ** 2, axis=1))))
    dist = float(np.sum(np.linalg.norm(np.diff(gt_p, axis=0), axis=1)))
    final_err = float(np.linalg.norm(err[-1]))
    drift = 100.0 * final_err / max(dist, 1e-9)
    return dict(ate_rmse=ate, drift_pct=drift, distance=dist,
                final_err=final_err, yaw_align_deg=float(np.degrees(th)))


def _main():
    """CLI replay driver — the reference's `roslaunch vilo run_*_bag_vilo`
    equivalent (launch/dataset/*.launch): stream a logged dataset (or a
    synthetic run) through the full estimator and report drift/ATE.

    Examples:
      python -m cerberus_tpu.data.replay --dataset /data/street_v1 --images
      python -m cerberus_tpu.data.replay --sim 30 --path street --csv out.csv
    """
    import argparse
    import json as _json

    ap = argparse.ArgumentParser(description=_main.__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--dataset", help="schema-v1 dataset directory "
                                       "(data/log_adapter.py)")
    src.add_argument("--sim", type=float, metavar="SECONDS",
                     help="synthetic run of this duration instead of a log")
    ap.add_argument("--config", help="reference-style YAML config "
                                     "(defaults to A1-shaped defaults)")
    ap.add_argument("--path", default="street", help="--sim trajectory shape")
    ap.add_argument("--speed", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--images", action="store_true",
                    help="run the image front-end (dataset: cam.csv images; "
                         "sim: rendered stereo) instead of ideal features")
    ap.add_argument("--tracker", default="cv", choices=["cv", "device"])
    ap.add_argument("--focal", type=float, default=460.0,
                    help="dataset image focal length (px)")
    ap.add_argument("--csv", help="write the 20-column result CSV")
    ap.add_argument("--metrics", help="write a JSONL metrics stream")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if args.platform == "tpu" and not on_tpu:
        ap.error("--platform tpu requested but no accelerator device is "
                 "present (jax.devices() is CPU-only)")
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from cerberus_tpu.config import EstimatorConfig, load_yaml

    cfg = load_yaml(args.config) if args.config else EstimatorConfig()
    est = Estimator(cfg, dtype=jnp.float32 if on_tpu else jnp.float64)
    if args.metrics:
        from cerberus_tpu.utils.metrics import MetricsLogger
        est.metrics = MetricsLogger(args.metrics)

    renderer = None
    if args.dataset:
        from cerberus_tpu.data.log_adapter import ImageLoader, load_dataset
        data = load_dataset(args.dataset)
        if args.images:
            renderer = ImageLoader(data, args.focal,
                                   cfg.image_width / 2.0,
                                   cfg.image_height / 2.0)
    else:
        from cerberus_tpu.data.simulator import ImageRenderer, SimConfig, \
            simulate
        data = simulate(SimConfig(duration=args.sim, speed=args.speed,
                                  path=args.path, seed=args.seed))
        if args.images:
            renderer = ImageRenderer(data, cfg)

    if not args.images and "features" not in data:
        raise SystemExit(
            "dataset has no features.npz — pass --images to run the "
            "KLT front-end on cam.csv imagery (vision is required: the "
            "reference asserts stereo+IMU, parameters.cpp:273)")
    if args.images:
        tracker = None
        if args.tracker == "device":
            from cerberus_tpu.frontend.device_tracker import DeviceTracker
            from cerberus_tpu.frontend.tracker import PinholeCamera
            cams = [PinholeCamera(renderer.f, renderer.f, renderer.cx,
                                  renderer.cy, size=(renderer.W, renderer.H))
                    for _ in range(2)]
            tracker = DeviceTracker(cams[0], cams[1], max_cnt=cfg.max_cnt,
                                    min_dist=cfg.min_dist,
                                    flow_back=cfg.flow_back)
        out = replay_images(data, est=est, renderer=renderer, tracker=tracker,
                            csv_path=args.csv, max_frames=args.max_frames)
    else:
        out = replay(data, est=est, csv_path=args.csv,
                     max_frames=args.max_frames)
    print(_json.dumps({k: round(float(v), 5) if isinstance(v, (int, float))
                       else v for k, v in out.items()
                       if k in ("drift_pct", "ate_rmse", "distance",
                                "final_err")}
                      | {"solves": est.stats["solves"],
                         "reboots": est.stats["reboots"],
                         "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    _main()

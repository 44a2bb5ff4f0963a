#!/usr/bin/env python
"""Long-horizon drift evaluation — the reference's headline claim is < 1 %
position drift over multi-hundred-meter rosbag trajectories (README.md:4,
street/campus/track tables README.md:53-74). This replays a long simulated
walk through the full streaming VILO pipeline and reports drift % of distance
traveled, matching the reference's evaluation protocol (final-error /
path-length after gravity-yaw alignment).

Modes:
  default            ideal simulated features -> estimator
  --images           rendered stereo images -> KLT front-end -> estimator
                     (the reference's actual hot path, main.cpp:95-202)
  --tracker device   on-device (XLA) KLT instead of the OpenCV front-end
  --loop             run the loop-closure back-end off keyframes and report
                     loop-corrected drift alongside odometric drift

Usage: python evals/long_run.py [--duration 120] [--path figure8]
       [--platform cpu|tpu|auto] [--csv out.csv] [--images] [--loop]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=120.0)
    ap.add_argument("--path", default="figure8")
    ap.add_argument("--speed", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"])
    ap.add_argument("--csv", default=None)
    ap.add_argument("--no-leg", action="store_true",
                    help="disable leg-odometry factors (vision+IMU only)")
    ap.add_argument("--no-vision", action="store_true",
                    help="disable vision (IMU+leg only)")
    ap.add_argument("--images", action="store_true",
                    help="render images and run the real KLT front-end")
    ap.add_argument("--tracker", default="cv", choices=["cv", "device"],
                    help="front-end for --images: OpenCV or on-device KLT")
    ap.add_argument("--no-predict", action="store_true",
                    help="disable feature prediction seeding")
    ap.add_argument("--no-pipeline-frontend", action="store_true",
                    help="render+track serially with the estimator (A/B of "
                         "the pipelined front-end's one-frame prediction "
                         "lag; slower wall-clock)")
    ap.add_argument("--loop-kf-dist", type=float, default=0.25,
                    help="pose-graph keyframe spacing (m); raise for runs "
                         "long enough to saturate the 2048-node pool")
    ap.add_argument("--loop", action="store_true",
                    help="run loop closure and report corrected drift")
    ap.add_argument("--loop-record", default=None,
                    help="pickle the keyframe record stream for offline "
                         "loop-back-end replay (evals/loop_replay.py)")
    ap.add_argument("--prerender", action="store_true",
                    help="render all frames BEFORE the timed replay "
                         "(camera frames on a real robot cost the VILO "
                         "process nothing; the software renderer is sim "
                         "overhead) — realtime_factor then measures "
                         "track->solve->adopt only")
    ap.add_argument("--robot", default="a1", choices=["a1", "go1"],
                    help="go1 = force-sigmoid contacts (type 2) with leg "
                         "bias fixed, per the reference's Go1 config "
                         "(config/go1_config/hardware_go1_vilo_config.yaml)")
    ap.add_argument("--out", default=None, help="append result to JSON file")
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    assert args.platform == "auto" or (args.platform == "tpu") == on_tpu, \
        f"requested {args.platform}, got {jax.devices()[0].platform}"
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.replay import replay, replay_images, score
    from cerberus_tpu.estimator.estimator import Estimator

    import dataclasses
    import numpy as np

    cfg = EstimatorConfig()
    if args.robot == "go1":
        from cerberus_tpu.config import GO1
        cfg = dataclasses.replace(cfg, robot=GO1, contact_sensor_type=2,
                                  optimize_leg_bias=False)
    sim = simulate(SimConfig(duration=args.duration, speed=args.speed,
                             path=args.path, seed=args.seed), est_cfg=cfg)
    if args.no_leg:
        cfg = dataclasses.replace(cfg, use_leg_odom=False,
                                  optimize_leg_bias=False)
    if args.no_vision:
        sim = dict(sim)
        sim["features"] = [{} for _ in sim["features"]]
    est = Estimator(cfg, dtype=dtype)

    closer = None
    images_for_loop = {}
    if args.loop:
        from cerberus_tpu.loop.closer import LoopCloser
        closer = LoopCloser(cfg, min_kf_dist=args.loop_kf_dist,
                            record=args.loop_record is not None)

        def on_keyframe(t, p, q, ids, obs):
            img = images_for_loop.pop(round(float(t), 6), None)
            closer.add_keyframe(t, p, q, ids, obs, img)

        est.keyframe_callback = on_keyframe

    prerender_s = None
    if args.images:
        from cerberus_tpu.data.simulator import ImageRenderer
        renderer = ImageRenderer(sim, cfg)
        if args.prerender:
            from cerberus_tpu.data.simulator import PrerenderedFrames
            renderer = PrerenderedFrames(
                renderer, sorted(set(int(i) for i in sim["cam_idx"])),
                progress=True)
            prerender_s = renderer.prerender_s
        tracker = None
        if args.tracker == "device":
            from cerberus_tpu.frontend.device_tracker import DeviceTracker
            from cerberus_tpu.frontend.tracker import PinholeCamera
            f = renderer.f
            cams = [PinholeCamera(f, f, renderer.cx, renderer.cy,
                                  size=(renderer.W, renderer.H))
                    for _ in range(2)]
            tracker = DeviceTracker(cams[0], cams[1], max_cnt=cfg.max_cnt,
                                    min_dist=cfg.min_dist,
                                    flow_back=cfg.flow_back,
                                    det_stereo=int(os.environ.get(
                                        "CERB_DET_STEREO", "32")))
        if args.loop:
            # retain rendered keyframe images for the loop front-end
            class _LoopRenderer:
                def __init__(self, inner, sim):
                    self._r = inner
                    self._t = sim["t"]
                    for a in ("f", "cx", "cy", "W", "H"):
                        setattr(self, a, getattr(inner, a))

                def render_stereo(self, k):
                    im0, im1 = self._r.render_stereo(k)
                    images_for_loop[round(float(self._t[k]), 6)] = im0
                    while len(images_for_loop) > 32:  # window depth is 11
                        images_for_loop.pop(next(iter(images_for_loop)))
                    return im0, im1
            renderer = _LoopRenderer(renderer, sim)
        t0 = time.time()
        out = replay_images(sim, est=est, tracker=tracker, renderer=renderer,
                            csv_path=args.csv,
                            use_prediction=not args.no_predict,
                            pipeline_frontend=not args.no_pipeline_frontend)
    else:
        t0 = time.time()
        out = replay(sim, est=est, csv_path=args.csv)
    wall = time.time() - t0
    realtime = args.duration / wall

    result = dict(
        platform=jax.devices()[0].platform, dtype=str(dtype.__name__),
        robot=args.robot,
        duration_s=args.duration, path=args.path, speed=args.speed,
        images=bool(args.images), tracker=args.tracker if args.images else None,
        distance_m=round(out["distance"], 2),
        drift_pct=round(out["drift_pct"], 4),
        final_err_m=round(out.get("final_err", float("nan")), 4),
        ate_rmse_m=round(out["ate_rmse"], 4),
        solves=est.stats["solves"], reboots=est.stats["reboots"],
        keyframes=est.stats["keyframes"],
        mean_solve_ms=round(1000 * est.stats["solve_time"]
                            / max(est.stats["solves"], 1), 1),
        mean_pack_ms=round(1000 * est.stats.get("pack_time", 0.0)
                           / max(est.stats["solves"], 1), 1),
        mean_solve_only_ms=round(1000 * est.stats.get("solve_only_time", 0.0)
                                 / max(est.stats["solves"], 1), 1),
        wall_s=round(wall, 1), realtime_factor=round(realtime, 2),
    )
    if args.images:
        result["render_ms_per_frame"] = round(out["render_ms_per_frame"], 1)
        result["track_ms_per_frame"] = round(out["track_ms_per_frame"], 1)
        if prerender_s is not None:
            result["prerendered"] = True
            result["prerender_s"] = round(prerender_s, 1)
    if closer is not None:
        if args.loop_record:
            closer.dump_records(args.loop_record)
        closer.finish()
        kf_t = closer.times()
        kf_p = closer.corrected()
        # ground truth at keyframe times
        gt = np.column_stack([np.interp(kf_t, sim["t"], sim["p"][:, i])
                              for i in range(3)])
        m_loop = score(kf_p, gt)
        # odometric drift on the IDENTICAL subsampled keyframe set — the
        # only fair baseline for corrected_drift (r2 compared corrected
        # keyframes against the full-rate odometric path, which differ in
        # coverage when the node pool saturates)
        m_odo = score(closer.odometric(), gt)
        result["loop"] = dict(
            loops_found=closer.loops_found,
            loops_rejected=closer.loops_rejected,
            rollbacks=closer.pg.stats["rollbacks"],
            pruned_edges=closer.pg.stats["pruned_edges"],
            optimizes=closer.pg.stats["optimizes"],
            best_sim=round(closer.best_sim, 3),
            keyframes=closer.pg.n,
            kf_skipped=closer.kf_skipped,
            corrected_drift_pct=round(m_loop["drift_pct"], 4),
            corrected_ate_m=round(m_loop["ate_rmse"], 4),
            odometric_kf_drift_pct=round(m_odo["drift_pct"], 4),
            odometric_kf_ate_m=round(m_odo["ate_rmse"], 4),
        )
    print(json.dumps(result))
    if args.out:
        existing = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        tag = args.tag or f"{args.path}_{int(args.duration)}s" + \
            ("_img" if args.images else "") + \
            (f"_{args.tracker}" if args.images else "") + \
            ("_loop" if args.loop else "") + \
            (f"_{args.robot}" if args.robot != "a1" else "")
        existing[tag] = result
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()

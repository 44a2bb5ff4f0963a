#!/usr/bin/env python
"""Long-horizon drift evaluation — the reference's headline claim is < 1 %
position drift over multi-hundred-meter rosbag trajectories (README.md:4,
street/campus/track tables README.md:53-74). This replays a long simulated
walk (default 120 s figure-8) through the full streaming VILO pipeline and
reports drift % of distance traveled, matching the reference's evaluation
protocol (final-error / path-length after first-pose alignment).

Usage: python evals/long_run.py [--duration 120] [--path figure8]
       [--platform cpu|tpu|auto] [--csv out.csv]
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
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.replay import replay
    from cerberus_tpu.estimator.estimator import Estimator

    import dataclasses

    sim = simulate(SimConfig(duration=args.duration, speed=args.speed,
                             path=args.path, seed=args.seed))
    cfg = EstimatorConfig()
    if args.no_leg:
        cfg = dataclasses.replace(cfg, use_leg_odom=False,
                                  optimize_leg_bias=False)
    if args.no_vision:
        sim = dict(sim)
        sim["features"] = [{} for _ in sim["features"]]
    est = Estimator(cfg, dtype=dtype)
    t0 = time.time()
    out = replay(sim, est=est, csv_path=args.csv)
    wall = time.time() - t0
    realtime = args.duration / wall
    print(json.dumps(dict(
        platform=jax.devices()[0].platform, dtype=str(dtype.__name__),
        duration_s=args.duration, path=args.path,
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
    )))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Adversarial robustness battery: full VILO under model mismatch.

Every headline accuracy number in CONFIG_RESULTS/LONGRUN runs the estimator
with noise/contact/slip parameters *matched* to the simulator that generated
the data. The reference's credibility claim is the opposite — surviving
uncontrolled real-world mismatch across five datasets, two robots and snow
(/root/reference/README.md:53-83) with failure detection + restart as the
safety net (estimator.cpp:823-831, thresholds :1013-1050). With no real bags
obtainable in this environment, this battery is the substitute: a grid of
deliberate model-mismatch perturbations, each a >=60 s full-VILO run,
recording drift/ATE/reboots into ROBUSTNESS.json.

Perturbations (VERDICT r3 item 1):
  estimator noise densities x0.25 / x4 vs sim truth; td mis-initialized
  +/-20 ms (estimate_td on); camera extrinsic rotation error 1-3 deg
  (estimate_extrinsic on); IMU sensor-hang dropouts (2 x 1 s frozen
  samples); contact-flag corruption bursts; low-texture world
  (n_landmarks/4); gait/speed outside the tuning set; foot slip x3.

Usage: python evals/robustness.py [--duration 60] [--out ROBUSTNESS.json]
       [--platform auto|cpu|tpu] [--cases name1,name2]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _rot(ax, ang):
    import numpy as np
    ax = np.asarray(ax, float) / np.linalg.norm(ax)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def perturb_extrinsics(cfg, deg):
    """Rotate both body_T_cam rotations by `deg` about a fixed skew axis —
    the estimator starts that far from the truth the sim projected with."""
    import numpy as np
    R_err = _rot([0.41, -0.62, 0.67], np.deg2rad(deg))
    def tw(T):
        T = np.array(T, float)
        T[:3, :3] = T[:3, :3] @ R_err
        return tuple(map(tuple, T))
    return dataclasses.replace(
        cfg, body_T_cam0=tw(cfg.body_T_cam0), body_T_cam1=tw(cfg.body_T_cam1),
        estimate_extrinsic=True)


def scale_noise(cfg, f):
    """Mis-set the estimator's IMU/joint noise densities by factor f while
    the sim keeps generating data at the true densities."""
    n = dataclasses.replace(
        cfg.noise, acc_n=cfg.noise.acc_n * f, acc_n_z=cfg.noise.acc_n_z * f,
        gyr_n=cfg.noise.gyr_n * f, acc_w=cfg.noise.acc_w * f,
        gyr_w=cfg.noise.gyr_w * f, joint_angle_n=cfg.noise.joint_angle_n * f,
        joint_velocity_n=cfg.noise.joint_velocity_n * f)
    return dataclasses.replace(cfg, noise=n)


def imu_dropout(sim, windows):
    """Freeze acc/gyr over the given (t0, t1) windows — a hung IMU driver
    repeating its last sample (worse than missing data: it is confidently
    wrong while the body keeps moving)."""
    import numpy as np
    sim = dict(sim)
    acc = np.array(sim["acc"])
    gyr = np.array(sim["gyr"])
    t = sim["t"]
    for t0, t1 in windows:
        i = np.where((t >= t0) & (t < t1))[0]
        if len(i):
            acc[i] = acc[i[0]]
            gyr[i] = gyr[i[0]]
    return dict(sim, acc=acc, gyr=gyr)


def corrupt_contacts(sim, rng, n_bursts=10, burst_s=0.3):
    """Invert the contact flags in random bursts (impact transients /
    mis-detected touchdown — the failure mode of contact source 1)."""
    import numpy as np
    sim = dict(sim)
    contacts = np.array(sim["contacts"])
    t = sim["t"]
    for _ in range(n_bursts):
        t0 = rng.uniform(t[0] + 2.0, t[-1] - burst_s)
        i = np.where((t >= t0) & (t < t0 + burst_s))[0]
        leg = rng.integers(0, 4, size=2)
        contacts[np.ix_(i, leg)] = 1.0 - contacts[np.ix_(i, leg)]
    return dict(sim, contacts=contacts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--out", default="ROBUSTNESS.json")
    ap.add_argument("--cases", default="")
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    assert args.platform == "auto" or (args.platform == "tpu") == on_tpu
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.replay import replay
    from cerberus_tpu.estimator.estimator import Estimator

    base_cfg = EstimatorConfig()
    dur = args.duration
    base_sim_cfg = SimConfig(duration=dur, speed=0.5, path="street", seed=31)

    def case(name, cfg=None, sim_cfg=None, sim_fn=None):
        return dict(name=name, cfg=cfg or base_cfg,
                    sim_cfg=sim_cfg or base_sim_cfg, sim_fn=sim_fn)

    rng = np.random.default_rng(77)
    cases = [
        case("baseline_matched"),
        case("noise_x0.25", cfg=scale_noise(base_cfg, 0.25)),
        case("noise_x4", cfg=scale_noise(base_cfg, 4.0)),
        case("td_init_+20ms", cfg=dataclasses.replace(
            base_cfg, td=0.020, estimate_td=True)),
        case("td_init_-20ms", cfg=dataclasses.replace(
            base_cfg, td=-0.020, estimate_td=True)),
        case("extrinsic_rot_1deg", cfg=perturb_extrinsics(base_cfg, 1.0)),
        case("extrinsic_rot_3deg", cfg=perturb_extrinsics(base_cfg, 3.0)),
        case("imu_dropout_2x1s", sim_fn=lambda s: imu_dropout(
            s, [(dur * 0.3, dur * 0.3 + 1.0), (dur * 0.7, dur * 0.7 + 1.0)])),
        case("contact_corruption", sim_fn=lambda s: corrupt_contacts(s, rng)),
        case("low_texture_150lm", sim_cfg=dataclasses.replace(
            base_sim_cfg, n_landmarks=150)),
        case("fast_untuned_gait", sim_cfg=dataclasses.replace(
            base_sim_cfg, speed=1.2, gait_freq=3.0)),
        case("slip_x3", sim_cfg=dataclasses.replace(
            base_sim_cfg, foot_slip_sigma=0.012,
            foot_slip_forward_bias=0.0045)),
    ]
    if args.cases:
        want = set(args.cases.split(","))
        cases = [c for c in cases if c["name"] in want]

    results = {"_meta": dict(
        platform=jax.devices()[0].platform, duration_s=dur,
        note="full VILO (injected ideal features), street sim seed 31; "
             "estimator model deliberately mismatched per case")}
    for c in cases:
        t0 = time.time()
        sim = simulate(c["sim_cfg"])
        if c["sim_fn"] is not None:
            sim = c["sim_fn"](sim)
        est = Estimator(c["cfg"], dtype=dtype)
        try:
            out = replay(sim, est=est)
            entry = dict(
                drift_pct=round(out["drift_pct"], 4),
                ate_rmse=round(out["ate_rmse"], 4),
                distance=round(out["distance"], 1),
                reboots=est.stats["reboots"], solves=est.stats["solves"],
                ok=bool(out["drift_pct"] < 1.0),
                wall_s=round(time.time() - t0, 1))
            if c["cfg"].estimate_td:
                entry["td_final_ms"] = round(float(est.td) * 1e3, 2)
        except Exception as e:  # a crash is a result, not a harness error
            entry = dict(error=f"{type(e).__name__}: {e}",
                         reboots=est.stats.get("reboots", 0), ok=False,
                         wall_s=round(time.time() - t0, 1))
        results[c["name"]] = entry
        print(f"{c['name']}: {entry}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    n_ok = sum(1 for k, v in results.items()
               if not k.startswith("_") and v.get("ok"))
    n = sum(1 for k in results if not k.startswith("_"))
    print(f"robustness: {n_ok}/{n} cases < 1% drift -> {args.out}",
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Tracker quality diagnostic: cv vs device KLT on identical rendered frames.

Associates each track (at birth) with the nearest ideal landmark projection
and measures the pixel error of the tracked position against that
landmark's true projection over the track's life — isolating front-end
accuracy from estimator effects (the street_300s_img_device run showed
8.7x worse drift than the cv front-end; this pinpoints where).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ideal_px(sim, r, i):
    """{landmark_id: true pixel (2,)} for cam frame i (left camera)."""
    out = {}
    for fid, (o0, v0, o1, v1) in sim["features"][i].items():
        # o0 holds the NOISY normalized obs; recompute the true projection
        out[int(fid)] = None
    k = int(sim["cam_idx"][i])
    import cerberus_tpu.data.simulator as S
    Rk = sim["R"][k]
    pk = sim["p"][k]
    ric, tic = r.cfg.ric_tic()
    lm = sim["landmarks"]
    pc = (lm - pk) @ Rk
    pc = (pc - tic[0]) @ ric[0]
    vis = pc[:, 2] > 0.3
    u = r.f * pc[:, 0] / np.where(vis, pc[:, 2], 1.0) + r.cx
    v = r.f * pc[:, 1] / np.where(vis, pc[:, 2], 1.0) + r.cy
    inb = vis & (u >= 0) & (u < r.W) & (v >= 0) & (v < r.H)
    return {j: np.array([u[j], v[j]]) for j in np.nonzero(inb)[0]}


def run_tracker(name, tracker, sim, r, n_frames, f, cx, cy):
    birth = {}      # track id -> landmark id
    errs = []
    lens = {}
    counts = []
    for i in range(n_frames):
        k = int(sim["cam_idx"][i])
        im0, im1 = r.render_stereo(k)
        out = tracker.track(float(sim["cam_t"][i]), im0, im1)
        counts.append(len(out))
        truth = ideal_px(sim, r, i)
        tp = np.array([truth[j] for j in truth]) if truth else np.zeros((0, 2))
        tids = list(truth)
        for fid, (pt, vel, ptr, velr) in out.items():
            px = np.array([f * pt[0] + cx, f * pt[1] + cy])
            if fid not in birth:
                if len(tp) == 0:
                    continue
                d = np.linalg.norm(tp - px, axis=1)
                j = int(np.argmin(d))
                if d[j] < 3.0:
                    birth[fid] = tids[j]
                continue
            lmid = birth[fid]
            if lmid in truth:
                errs.append(float(np.linalg.norm(truth[lmid] - px)))
                lens[fid] = lens.get(fid, 0) + 1
    errs = np.array(errs) if errs else np.array([np.nan])
    ln = np.array(list(lens.values())) if lens else np.array([0])
    print(f"{name}: n_feat p50 {np.percentile(counts,50):.0f}  "
          f"track-err px p50 {np.nanpercentile(errs,50):.3f} "
          f"p90 {np.nanpercentile(errs,90):.3f}  "
          f"track len p50 {np.percentile(ln,50):.0f}")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.simulator import ImageRenderer
    from cerberus_tpu.frontend.tracker import FeatureTracker, PinholeCamera
    from cerberus_tpu.frontend.device_tracker import DeviceTracker

    cfg = EstimatorConfig()
    sim = simulate(SimConfig(duration=8.0, speed=0.75, path="street",
                             seed=77), est_cfg=cfg)
    r = ImageRenderer(sim, cfg)
    n_frames = min(len(sim["cam_t"]), 90)
    cams = [PinholeCamera(r.f, r.f, r.cx, r.cy, size=(r.W, r.H))
            for _ in range(2)]
    cv_tr = FeatureTracker(cams[0], cams[1], max_cnt=cfg.max_cnt,
                           min_dist=cfg.min_dist, flow_back=cfg.flow_back)
    dev_tr = DeviceTracker(cams[0], cams[1], max_cnt=cfg.max_cnt,
                           min_dist=cfg.min_dist, flow_back=cfg.flow_back)
    run_tracker("cv    ", cv_tr, sim, r, n_frames, r.f, r.cx, r.cy)
    run_tracker("device", dev_tr, sim, r, n_frames, r.f, r.cx, r.cy)


if __name__ == "__main__":
    main()

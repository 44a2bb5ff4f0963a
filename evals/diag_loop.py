#!/usr/bin/env python
"""Loop-closure pipeline diagnostic, isolated from the estimator.

Drives LoopCloser with GROUND-TRUTH keyframe poses, ideal feature
observations, true landmark world points, and the real rendered images
around the street circuit — so any rejection is attributable to the visual
matching / PnP stages themselves, not to estimator drift or bookkeeping.
Counts where candidates die: patch matching, world-point availability, or
RANSAC PnP.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.simulator import ImageRenderer
from cerberus_tpu.estimator import pnp
from cerberus_tpu.loop import descriptors as desc
from cerberus_tpu.loop.closer import LoopCloser


class DiagCloser(LoopCloser):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.st = dict(cand=0, few_matches=0, few_world=0, pnp_fail=0,
                       pnp_ok=0, match_counts=[], world_counts=[],
                       pnp_err=[])

    def _try_close(self, old_idx, rec, sim=1.0):
        self.st["cand"] += 1
        old = self.db[old_idx]
        need = self._required_matches(sim)
        i_new, i_old = desc.match_patches(rec["descs"], rec["ok"],
                                          old["descs"], old["ok"])
        self.st["match_counts"].append(len(i_new))
        if len(i_new) < need:
            self.st["few_matches"] += 1
            self.loops_rejected += 1
            return
        w_old = old["world"][i_old]
        good = ~np.isnan(w_old[:, 0])
        self.st["world_counts"].append(int(good.sum()))
        if good.sum() < need:
            self.st["few_world"] += 1
            self.loops_rejected += 1
            return
        res = pnp.ransac_pnp(w_old[good], rec["uv"][i_new][good],
                             min_inliers=need)
        if res is None:
            self.st["pnp_fail"] += 1
            self.loops_rejected += 1
            return
        self.st["pnp_ok"] += 1
        R_cam, t_cam, inl = res
        R_body = R_cam @ self.ric0.T
        p_body = t_cam - R_body @ self.tic0
        self.st["pnp_err"].append(float(np.linalg.norm(
            p_body - rec["p_odo"])))
        super()._try_close(old_idx, rec, sim=sim)
        # undo double-counting by the parent call
        self.st["cand"] -= 1


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    cfg = EstimatorConfig()
    sim = simulate(SimConfig(duration=180.0, speed=0.75, path="street",
                             seed=77), est_cfg=cfg)
    r = ImageRenderer(sim, cfg)
    closer = DiagCloser(cfg, focal=r.f, cx=r.cx, cy=r.cy)
    lm = sim["landmarks"]

    t0 = time.time()
    n_kf = 0
    for i, tc in enumerate(sim["cam_t"]):
        k = int(sim["cam_idx"][i])
        p, q = sim["p"][k], sim["q"][k]
        feats = sim["features"][i]
        obs = {int(f): (np.asarray(o0[:2]), lm[int(f)])
               for f, (o0, v0, o1, v1) in feats.items()}
        img0, _ = r.render_stereo(k)
        node = closer.add_keyframe(float(tc), p, q, sorted(obs), obs, img0)
        if node >= 0:
            n_kf += 1
    closer.finish()
    st = closer.st
    mc = np.array(st.pop("match_counts") or [0])
    wc = np.array(st.pop("world_counts") or [0])
    pe = np.array(st.pop("pnp_err") or [np.nan])
    print(f"keyframes {n_kf} skipped {closer.kf_skipped} "
          f"wall {time.time()-t0:.0f}s")
    print(f"candidates {st['cand']} -> few_matches {st['few_matches']} "
          f"few_world {st['few_world']} pnp_fail {st['pnp_fail']} "
          f"pnp_ok {st['pnp_ok']}")
    print(f"match counts p50/p90: {np.percentile(mc,50):.0f} "
          f"{np.percentile(mc,90):.0f}  (need >= {closer.min_matches})")
    print(f"world counts p50/p90: {np.percentile(wc,50):.0f} "
          f"{np.percentile(wc,90):.0f}")
    print(f"loops_found {closer.loops_found} best_sim {closer.best_sim:.3f} "
          f"pnp pos err p50 {np.nanmedian(pe):.3f} m")


if __name__ == "__main__":
    main()

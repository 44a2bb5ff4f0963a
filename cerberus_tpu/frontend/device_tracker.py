"""On-device (TPU) feature tracker built on ops/klt.py.

Same algorithmic pipeline and output format as frontend/tracker.FeatureTracker
(itself mirroring the reference's trackImage, feature_tracker.cpp:94-302):
pyramidal LK with forward-backward check, min-distance masking preferring
long tracks, Shi-Tomasi replenishment, left->right stereo LK, per-feature
normalized-plane velocities — but the per-frame compute (pyramids, LK,
detection) runs as jitted XLA programs with static shapes, so it can be
vmapped/sharded over thousands of streams (the reference's single-threaded
OpenCV front-end is the throughput ceiling SURVEY.md §3 hot-loop #4 calls
out).

Slot bookkeeping (ids, track counts) stays on host — tiny, and keeps the
device programs shape-static. The tracker works on raw grayscale images of a
fixed (H, W); CLAHE is optional host-side preprocessing.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cerberus_tpu.ops import klt


class DeviceTracker:
    """Drop-in tracker with FeatureTracker.track()'s output format:
    {id: (pt0 (3,), vel0 (2,), pt1 (3,)|None, vel1 (2,))}, normalized plane."""

    def __init__(self, cam0, cam1=None, max_cnt=120, min_dist=10,
                 flow_back=True, levels=4, half=10, iters=10):
        # levels=4 == OpenCV maxLevel=3 (four pyramid images). At 3 levels
        # the coarsest-level motion of a 15 Hz walking sequence (~4-5 px)
        # exceeds the attraction basin of small blob features: ~10% of
        # tracks diverged 20+ px and died at the flow-back gate (survival
        # 60%/frame vs cv 94%; street_300s_img_device drifted 2.1% vs
        # 0.245%). With 4 levels the kernel matches OpenCV on the same
        # frame pair: 0.060 vs 0.061 px median error, 99% fb-pass.
        self.cam0, self.cam1 = cam0, cam1
        self.max_cnt, self.min_dist = max_cnt, min_dist
        self.flow_back = flow_back
        self.levels, self.half, self.iters = levels, half, iters
        self.next_id = 0
        self.ids = np.zeros((0,), np.int64)
        self.track_cnt = np.zeros((0,), np.int64)
        self.prev_pts = np.zeros((0, 2), np.float32)
        self.prev_pyr = None
        self.prev_time = None
        self.prev_un: dict[int, np.ndarray] = {}
        self._prev_r_un: dict[int, np.ndarray] = {}
        self.predict_pts: dict[int, np.ndarray] | None = None

        self._pyramid = jax.jit(
            lambda im: klt.build_pyramid(im, self.levels))

    # ------------------------------------------------------------------
    def _lk(self, pyr0, pyr1, pts, guess=None):
        """Track host pts (N,2) pyr0->pyr1; returns (new_pts, status) np."""
        if len(pts) == 0:
            return pts.copy(), np.zeros((0,), bool)
        p = jnp.asarray(pts, jnp.float32)
        g = None if guess is None else jnp.asarray(guess, jnp.float32)
        valid = jnp.ones((len(pts),), bool)
        fn = klt.lk_track_fb if self.flow_back else klt.lk_track
        res = fn(pyr0, pyr1, p, valid, g, half=self.half, iters=self.iters)
        new, st = jax.device_get((res.pts, res.status))
        return np.asarray(new), np.asarray(st)

    def _mask_and_detect(self, pyr0, img_shape, cur_pts):
        """Min-distance mask preferring long tracks + top-up detection
        (reference: feature_tracker.cpp:55-84, 177-195)."""
        H, W = img_shape
        order = np.argsort(-self.track_cnt, kind="stable")
        keep = []
        occ = np.zeros((H, W), bool)
        for i in order:
            x, y = int(round(cur_pts[i, 0])), int(round(cur_pts[i, 1]))
            if 0 <= x < W and 0 <= y < H and not occ[y, x]:
                keep.append(i)
                y0, y1 = max(0, y - self.min_dist), min(H, y + self.min_dist + 1)
                x0, x1 = max(0, x - self.min_dist), min(W, x + self.min_dist + 1)
                occ[y0:y1, x0:x1] = True
        keep = np.array(keep, np.int64) if keep else np.zeros((0,), np.int64)
        cur_pts = cur_pts[keep]
        self.ids = self.ids[keep]
        self.track_cnt = self.track_cnt[keep]

        n_new = self.max_cnt - len(cur_pts)
        if n_new > 0:
            pts, ok = klt.detect_features(
                pyr0[0], jnp.asarray(occ), max_new=int(self.max_cnt),
                min_dist=self.min_dist)
            pts, ok = jax.device_get((pts, ok))
            pts = pts[ok][:n_new]
            if len(pts):
                cur_pts = np.concatenate([cur_pts, pts.astype(np.float32)])
                new_ids = np.arange(self.next_id, self.next_id + len(pts))
                self.next_id += len(pts)
                self.ids = np.concatenate([self.ids, new_ids])
                self.track_cnt = np.concatenate(
                    [self.track_cnt, np.zeros(len(pts), np.int64)])
        return cur_pts

    # ------------------------------------------------------------------
    def track(self, t: float, img0: np.ndarray, img1: np.ndarray | None = None):
        img0 = np.asarray(img0, np.float32)
        pyr0 = self._pyramid(jnp.asarray(img0))

        cur_pts = np.zeros((0, 2), np.float32)
        if len(self.prev_pts):
            guess = None
            if self.predict_pts:
                guess = self.prev_pts.copy()
                for i, fid in enumerate(self.ids):
                    if fid in self.predict_pts:
                        guess[i] = self.predict_pts[fid]
            cur, st = self._lk(self.prev_pyr, pyr0, self.prev_pts, guess)
            cur_pts = cur[st]
            self.ids = self.ids[st]
            self.track_cnt = self.track_cnt[st] + 1
        cur_pts = self._mask_and_detect(pyr0, img0.shape, cur_pts)

        right = {}
        if img1 is not None and self.cam1 is not None and len(cur_pts):
            pyr1 = self._pyramid(jnp.asarray(np.asarray(img1, np.float32)))
            curR, stR = self._lk(pyr0, pyr1, cur_pts)
            un_r = self.cam1.undistort_normalize(curR)
            for i in np.nonzero(stR)[0]:
                right[int(self.ids[i])] = un_r[i]

        un = self.cam0.undistort_normalize(cur_pts)
        dt = (t - self.prev_time) if self.prev_time is not None else 1.0
        out, new_un, new_r_un = {}, {}, {}
        for i, fid in enumerate(self.ids):
            fid = int(fid)
            vel = ((un[i] - self.prev_un[fid]) / dt
                   if fid in self.prev_un else np.zeros(2))
            new_un[fid] = un[i]
            pt = np.array([un[i][0], un[i][1], 1.0])
            if fid in right:
                rv = ((right[fid] - self._prev_r_un[fid]) / dt
                      if fid in self._prev_r_un else np.zeros(2))
                new_r_un[fid] = right[fid]
                out[fid] = (pt, vel,
                            np.array([right[fid][0], right[fid][1], 1.0]), rv)
            else:
                out[fid] = (pt, vel, None, np.zeros(2))

        self.prev_pyr = pyr0
        self.prev_pts = cur_pts
        self.prev_un, self._prev_r_un = new_un, new_r_un
        self.prev_time = t
        self.predict_pts = None
        return out

    def set_prediction(self, pts: dict[int, np.ndarray]):
        self.predict_pts = pts

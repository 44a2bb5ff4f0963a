"""Loop-closure pipeline: place recognition -> patch matching -> PnP ->
4-DoF pose graph.

End-to-end equivalent of the reference's external loop_fusion process
(launch/hardware_a1/hardware_a1_vilo.launch:8-10 + VINS-Fusion pose_graph:
keyframe topics -> DBoW2 retrieval -> BRIEF matching -> PnP relative pose ->
4-DoF graph). Runs in-process off the estimator's keyframe_callback and the
replay loop's rendered keyframe images.
"""

from __future__ import annotations

import numpy as np

from cerberus_tpu.estimator import pnp
from cerberus_tpu.loop import descriptors as desc
from cerberus_tpu.loop.posegraph import PoseGraph, _np_rot_z


def _yaw_of_quat(q):
    w, x, y, z = q
    return float(np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z)))


class LoopCloser:
    """Consumes keyframes (pose + feature obs + image), maintains the place
    index and pose graph, and produces a loop-corrected trajectory."""

    def __init__(self, cfg=None, focal: float = 460.0, cx: float = 320.0,
                 cy: float = 240.0, min_matches: int = 12,
                 min_sim: float = 0.60, exclude_last: int = 40,
                 optimize_every: int = 10):
        # min_sim gates only the PROPOSAL; every candidate still has to
        # survive mutual-best ZNCC patch matching (>= min_matches) and
        # RANSAC PnP before an edge is added, so a permissive default is
        # safe (0.85 found zero candidates over a 240 s rendered circuit
        # whose true revisit similarity peaked lower; measured via
        # stats['best_sim']).
        from cerberus_tpu.config import EstimatorConfig
        self.cfg = cfg or EstimatorConfig()
        ric, tic = self.cfg.ric_tic()
        self.ric0, self.tic0 = ric[0], tic[0]
        self.f, self.cx, self.cy = focal, cx, cy
        self.pg = PoseGraph()
        self.index = desc.PlaceIndex()
        self.db: list[dict] = []
        self.min_matches = min_matches
        self.min_sim = min_sim
        self.exclude_last = exclude_last
        self.optimize_every = optimize_every
        self.loops_found = 0
        self.loops_rejected = 0
        self.best_sim = -1.0   # max place-recognition score seen (diagnostic)
        self._since_opt = 0

    # ------------------------------------------------------------------
    def add_keyframe(self, t, p, q, ids, obs: dict, img: np.ndarray | None):
        """obs: {fid: (uv_norm (2,), world_pt (3,) | None)} from the
        estimator; img: the keyframe's left image (None disables visual
        loop detection for this keyframe)."""
        yaw = _yaw_of_quat(q)
        node = self.pg.add_keyframe(np.asarray(p, float), yaw, ids)
        if node < 0:
            return node
        rec = dict(t=t, node=node, ids=np.asarray(sorted(obs), dtype=np.int64))
        fids = rec["ids"]
        uv = np.array([obs[i][0] for i in fids]) if len(fids) else \
            np.zeros((0, 2))
        world = np.array([obs[i][1] if obs[i][1] is not None
                          else [np.nan] * 3 for i in fids]) if len(fids) \
            else np.zeros((0, 3))
        rec["uv"] = uv
        rec["world"] = world
        if img is not None and len(fids):
            px = np.column_stack([self.f * uv[:, 0] + self.cx,
                                  self.f * uv[:, 1] + self.cy])
            rec["descs"], rec["ok"] = desc.extract_patches(img, px)
            g = desc.tiny_image(img)
            cand = self.index.query(g, self.exclude_last, min_sim=0.0)
            self.index.add(g)
            if cand is not None:
                self.best_sim = max(self.best_sim, cand[1])
                if cand[1] >= self.min_sim:
                    self._try_close(cand[0], rec)
        else:
            self.index.add(np.zeros(desc.TINY_H * desc.TINY_W, np.float32))
            rec["descs"] = np.zeros((len(fids), desc.PATCH_DIM), np.float32)
            rec["ok"] = np.zeros(len(fids), bool)
        self.db.append(rec)
        self._since_opt += 1
        if self._since_opt >= self.optimize_every and self.pg.edges:
            self.pg.optimize()
            self._since_opt = 0
        return node

    # ------------------------------------------------------------------
    def _try_close(self, old_idx: int, rec: dict):
        """Verify a place-recognition candidate: patch matching + RANSAC PnP
        of the NEW keyframe against the OLD keyframe's 3D points, then add a
        measured relative-pose edge."""
        old = self.db[old_idx]
        i_new, i_old = desc.match_patches(rec["descs"], rec["ok"],
                                          old["descs"], old["ok"])
        if len(i_new) < self.min_matches:
            self.loops_rejected += 1
            return
        w_old = old["world"][i_old]
        good = ~np.isnan(w_old[:, 0])
        if good.sum() < self.min_matches:
            self.loops_rejected += 1
            return
        pts3d = w_old[good]
        pts2d = rec["uv"][i_new][good]
        res = pnp.ransac_pnp(pts3d, pts2d, min_inliers=self.min_matches)
        if res is None:
            self.loops_rejected += 1
            return
        R_cam, t_cam, inl = res
        # camera -> body (left cam extrinsics)
        R_body = R_cam @ self.ric0.T
        p_body = t_cam - R_body @ self.tic0
        yaw_meas = float(np.arctan2(R_body[1, 0], R_body[0, 0]))
        i = old["node"]
        j = rec["node"]
        Ri = _np_rot_z(self.pg.yaw[i])
        rel_p = Ri.T @ (p_body - self.pg.p[i])
        rel_yaw = yaw_meas - self.pg.yaw[i]
        self.pg.add_loop_edge(i, j, rel_p=rel_p, rel_yaw=rel_yaw, weight=20.0)
        self.loops_found += 1

    # ------------------------------------------------------------------
    def finish(self):
        if self.pg.edges:
            self.pg.optimize(iters=16)

    def corrected(self) -> np.ndarray:
        """(n, 3) loop-corrected keyframe positions."""
        return self.pg.p[: self.pg.n].copy()

    def times(self) -> np.ndarray:
        return np.array([r["t"] for r in self.db])

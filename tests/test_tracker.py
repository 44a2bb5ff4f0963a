"""KLT front-end tests on synthetic imagery."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cerberus_tpu.frontend.tracker import FeatureTracker, PinholeCamera


def render(pts, size=(480, 640), seed=0):
    """Render blurred dots at pts (N,2) onto a textured background."""
    rng = np.random.default_rng(seed)
    img = (rng.uniform(20, 60, size=size)).astype(np.uint8)
    for x, y in pts:
        if 5 <= x < size[1] - 5 and 5 <= y < size[0] - 5:
            cv2.circle(img, (int(x), int(y)), 3, 255, -1)
    return cv2.GaussianBlur(img, (5, 5), 1.0)


def test_tracks_translation_and_stereo():
    rng = np.random.default_rng(0)
    cam = PinholeCamera(460, 460, 320, 240)
    tr = FeatureTracker(cam, cam, max_cnt=80, min_dist=15)

    base = rng.uniform([30, 30], [610, 450], size=(120, 2))
    disparity = 8.0  # constant-depth stereo shift
    shift = np.array([3.0, 1.5])

    ids_per_frame = []
    for k in range(5):
        pts = base + k * shift
        img0 = render(pts, seed=1)
        img1 = render(pts - [disparity, 0], seed=1)
        out = tr.track(k * 1 / 15.0, img0, img1)
        ids_per_frame.append(set(out.keys()))
        if k >= 1:
            surv = ids_per_frame[k] & ids_per_frame[0]
            assert len(surv) > 30, len(surv)
            # check velocity direction for tracked features
            vels = [v for fid, (p, v, pr, vr) in out.items()
                    if fid in ids_per_frame[0] and np.linalg.norm(v) > 0]
            vels = np.array(vels)
            if len(vels):
                # velocity in normalized units; direction must match shift
                assert np.mean(vels[:, 0]) > 0
            # stereo disparity recovered: u_left - u_right ~ disparity/f
            got = [(p[0] - pr[0]) for fid, (p, v, pr, vr) in out.items()
                   if pr is not None]
            assert len(got) > 20
            np.testing.assert_allclose(np.median(got), disparity / 460,
                                       rtol=0.2)


def test_outlier_removal_and_replenish():
    rng = np.random.default_rng(1)
    cam = PinholeCamera(460, 460, 320, 240)
    tr = FeatureTracker(cam, None, max_cnt=50, min_dist=12)
    pts = rng.uniform([30, 30], [610, 450], size=(80, 2))
    out0 = tr.track(0.0, render(pts))
    some = list(out0.keys())[:10]
    tr.remove_outliers(some)
    out1 = tr.track(1 / 15.0, render(pts + 2))
    assert all(fid not in out1 or fid not in some for fid in some)
    assert len(out1) >= 30  # replenished

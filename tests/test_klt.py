"""On-device KLT (ops/klt.py) vs OpenCV ground truth.

The reference front-end is cv::calcOpticalFlowPyrLK + goodFeaturesToTrack
(feature_tracker.cpp:112-195); these tests hold the XLA implementation to the
same behavior on synthetic imagery.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from cerberus_tpu.ops import klt


def _textured(rng, H=120, W=160):
    """Smooth random texture with enough gradient everywhere."""
    img = rng.uniform(0, 255, size=(H // 4, W // 4)).astype(np.float32)
    img = cv2.resize(img, (W, H), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (5, 5), 1.0)


def _shift(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def test_lk_recovers_known_shift(rng):
    img0 = _textured(rng)
    dx, dy = 3.3, -2.7
    img1 = _shift(img0, dx, dy)
    pyr0 = klt.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = klt.build_pyramid(jnp.asarray(img1), 3)
    xs = rng.uniform(30, 130, size=(40, 1))
    ys = rng.uniform(30, 90, size=(40, 1))
    pts = jnp.asarray(np.concatenate([xs, ys], 1), jnp.float32)
    res = klt.lk_track(pyr0, pyr1, pts, jnp.ones(40, bool))
    st = np.asarray(res.status)
    assert st.mean() > 0.9
    flow = np.asarray(res.pts)[st] - np.asarray(pts)[st]
    err = np.linalg.norm(flow - np.array([dx, dy]), axis=1)
    assert np.median(err) < 0.15, np.median(err)


def test_lk_matches_opencv_on_warp(rng):
    """Rotation+translation warp: median disagreement with cv2 < 0.3 px."""
    img0 = _textured(rng)
    H, W = img0.shape
    M = cv2.getRotationMatrix2D((W / 2, H / 2), 2.0, 1.0)
    M[:, 2] += [1.5, -1.0]
    img1 = cv2.warpAffine(img0, M, (W, H), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)
    xs = rng.uniform(30, W - 30, size=(60, 1)).astype(np.float32)
    ys = rng.uniform(30, H - 30, size=(60, 1)).astype(np.float32)
    p0 = np.concatenate([xs, ys], 1)
    cvp, cvst, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8), img1.astype(np.uint8), p0, None,
        winSize=(21, 21), maxLevel=2)
    pyr0 = klt.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = klt.build_pyramid(jnp.asarray(img1), 3)
    res = klt.lk_track_fb(pyr0, pyr1, jnp.asarray(p0), jnp.ones(60, bool))
    st = np.asarray(res.status) & cvst.reshape(-1).astype(bool)
    assert st.sum() > 30
    d = np.linalg.norm(np.asarray(res.pts)[st] - cvp[st], axis=1)
    assert np.median(d) < 0.3, np.median(d)


def test_fb_check_kills_occluded(rng):
    """Blanking a region must drop tracks there via the fb check."""
    img0 = _textured(rng)
    img1 = _shift(img0, 2.0, 0.0)
    img1[40:80, 60:100] = 0.0
    pts = np.array([[80.0, 60.0], [20.0, 20.0]], np.float32)  # in hole, clean
    pyr0 = klt.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = klt.build_pyramid(jnp.asarray(img1), 3)
    res = klt.lk_track_fb(pyr0, pyr1, jnp.asarray(pts), jnp.ones(2, bool))
    st = np.asarray(res.status)
    assert st[1] and not st[0]


def test_detect_features_corners_and_spacing(rng):
    """Checkerboard corners found; min-dist and occupancy respected."""
    H, W = 96, 128
    img = np.zeros((H, W), np.float32)
    sq = 16
    for i in range(0, H, sq):
        for j in range(0, W, sq):
            if ((i + j) // sq) % 2 == 0:
                img[i:i + sq, j:j + sq] = 255.0
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    occupied = np.zeros((H, W), bool)
    occupied[:, : W // 2] = True  # forbid the left half
    pts, ok = klt.detect_features(jnp.asarray(img), jnp.asarray(occupied),
                                  max_new=30, min_dist=6)
    pts, ok = np.asarray(pts)[np.asarray(ok)], None
    assert len(pts) >= 8
    # all in right half and spaced
    assert (pts[:, 0] >= W // 2 - 1).all()
    from scipy.spatial.distance import pdist
    if len(pts) > 1:
        assert pdist(pts).min() >= 6.0


def test_device_tracker_stream(rng):
    """DeviceTracker end-to-end on a translating stream: stable ids, plausible
    normalized velocities, stereo associations."""
    from cerberus_tpu.frontend.device_tracker import DeviceTracker
    from cerberus_tpu.frontend.tracker import PinholeCamera

    H, W = 120, 160
    cam = PinholeCamera(fx=100, fy=100, cx=W / 2, cy=H / 2, size=(W, H))
    tr = DeviceTracker(cam, cam, max_cnt=40, min_dist=8)
    base = _textured(rng, H, W + 40)
    feats_hist = []
    for k in range(4):
        img0 = base[:, k * 2: k * 2 + W]
        img1 = base[:, k * 2 + 4: k * 2 + 4 + W]   # fake right cam: 4 px disparity
        out = tr.track(k / 15.0, img0, img1)
        feats_hist.append(out)
    # ids persist
    common = set(feats_hist[1]) & set(feats_hist[3])
    assert len(common) > 10
    # velocity: -2 px/frame * 15 fps / fx = -0.3 units/s in x
    vx = np.median([feats_hist[3][i][1][0] for i in common])
    assert abs(vx - (-0.3)) < 0.08, vx
    # stereo: right view shows content 4 px to the LEFT => x_r - x_l ~ -0.04
    st = [fid for fid in feats_hist[3] if feats_hist[3][fid][2] is not None]
    assert len(st) > 10
    dis = np.median([feats_hist[3][fid][2][0] - feats_hist[3][fid][0][0]
                     for fid in st])
    assert abs(dis - (-0.04)) < 0.015, dis


def test_sample_patches_equals_gather_bilinear(rng):
    """The separable hat-matrix patch sampler (MXU form) must equal the
    gather-based bilinear reference exactly (same clamping, same taps)."""
    import jax.numpy as jnp
    from cerberus_tpu.ops.klt import (_bilinear, _patch_grid, _sample_patches)

    H, W, half = 48, 64, 5
    img = jnp.asarray(rng.uniform(0, 255, size=(H, W)).astype(np.float32))
    pts = jnp.asarray(
        rng.uniform([-3, -3], [W + 3, H + 3], size=(12, 2)).astype(np.float32))
    grid = _patch_grid(half, jnp.float32)
    ref = np.stack([np.asarray(_bilinear(img, p[None, :] + grid))
                    .reshape(2 * half + 1, 2 * half + 1) for p in pts])
    (got,) = _sample_patches([img], pts[:, 0], pts[:, 1], half)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=2e-3)

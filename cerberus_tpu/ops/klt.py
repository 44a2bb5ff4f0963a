"""Batched pyramidal Lucas-Kanade optical flow + Shi-Tomasi detection on TPU.

TPU-native equivalent of the reference's OpenCV front-end — pyramidal
cv::calcOpticalFlowPyrLK with forward-backward consistency checking
(reference: src/featureTracker/feature_tracker.cpp:112-151) and
cv::goodFeaturesToTrack replenishment (feature_tracker.cpp:177-195) — as one
jitted, static-shape program:

  * N point slots with a validity mask (no dynamic feature counts),
  * L pyramid levels built by separable Gaussian blur + 2x subsample,
  * K fixed Gauss-Newton iterations per level,
  * bilinear patch gathers (the only gather in the hot path; ~N*P^2 elements),
  * 2x2 normal equations solved in closed form per point.

Everything vmaps over a batch of streams: a pod-scale deployment tracks
thousands of camera streams by sharding the batch axis over the mesh, which is
the capability the reference's single-threaded OpenCV front-end fundamentally
lacks (SURVEY.md §7 build step 7b, hard part 5).

Coordinates are (x, y) pixels at level-0 resolution, matching OpenCV.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_G5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_blur(img: jax.Array) -> jax.Array:
    """5-tap separable Gaussian blur with edge replication, (H, W) f32."""
    k = _G5.astype(img.dtype)
    pad = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(pad[i : i + img.shape[0]] * k[i] for i in range(5))
    pad = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(pad[:, i : i + img.shape[1]] * k[i] for i in range(5))
    return img


def build_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    """Gaussian pyramid [level0 (H,W), level1 (H/2,W/2), ...], f32."""
    img = img.astype(jnp.float32)
    pyr = [img]
    for _ in range(levels - 1):
        img = _sep_blur(img)[::2, ::2]
        pyr.append(img)
    return pyr


def _scharr(img: jax.Array):
    """Scharr x/y derivative images (3/32 · [3 10 3] ⊗ [-1 0 1])."""
    s = jnp.array([3.0, 10.0, 3.0], img.dtype) / 32.0
    d = jnp.array([-1.0, 0.0, 1.0], img.dtype)

    def conv1d(a, k, axis):
        pad = [(1, 1), (0, 0)] if axis == 0 else [(0, 0), (1, 1)]
        p = jnp.pad(a, pad, mode="edge")
        if axis == 0:
            return sum(p[i : i + a.shape[0]] * k[i] for i in range(3))
        return sum(p[:, i : i + a.shape[1]] * k[i] for i in range(3))

    ix = conv1d(conv1d(img, d, 1), s, 0)
    iy = conv1d(conv1d(img, d, 0), s, 1)
    return ix, iy


def _bilinear(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample img (H, W) at xy (..., 2) float (x, y) with border clamping."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)
    idx = y0 * W + x0
    v00 = jnp.take(flat, idx)
    v01 = jnp.take(flat, idx + 1)
    v10 = jnp.take(flat, idx + W)
    v11 = jnp.take(flat, idx + W + 1)
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


class LKResult(NamedTuple):
    pts: jax.Array      # (N, 2) tracked positions, level-0 pixels
    status: jax.Array   # (N,) bool — tracked successfully
    err: jax.Array      # (N,) mean absolute patch residual


def _patch_grid(half: int, dtype):
    r = jnp.arange(-half, half + 1, dtype=dtype)
    gx, gy = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([gx, gy], -1).reshape(-1, 2)  # (P^2, 2)


def _hat(centers: jax.Array, half: int, size: int) -> jax.Array:
    """(N, P, size) separable bilinear-interpolation rows.

    Row j of feature f is the hat function max(0, 1 - |w - x_fj|) over pixel
    index w, where x_fj = clip(centers[f] + (j - half)). A (N,P,size) @
    (size, other) contraction therefore EQUALS bilinear sampling along this
    axis (two nonzero taps (1-frac, frac) per row — identical math to the
    gather-based _bilinear incl. border clamping)."""
    dtype = centers.dtype
    offs = jnp.arange(-half, half + 1, dtype=dtype)              # (P,)
    xi = jnp.clip(centers[:, None] + offs[None, :], 0.0, size - 1.001)
    w = jnp.arange(size, dtype=dtype)                            # (size,)
    return jnp.maximum(0.0, 1.0 - jnp.abs(w[None, None, :] - xi[:, :, None]))


def _sample_patches(imgs: list[jax.Array], cx, cy, half: int):
    """Bilinear (P, P) patches of each image at centers (cx, cy) (N,) —
    as two MXU contractions per image instead of 4-way gathers. TPU gathers
    run near-scalar speed (measured ~130 ms per 640x480 stream-track on
    v5e); the dense separable form is ~2 orders of magnitude faster and is
    exactly equal bilinear math."""
    H, W = imgs[0].shape
    Ry = _hat(cy, half, H)                                       # (N, P, H)
    Rx = _hat(cx, half, W)                                       # (N, P, W)
    # contract width first: (N, P, W) x (H, W) -> (N, P, H)  [MXU]
    out = []
    # HIGHEST precision: the hat rows carry sub-pixel fractions and the
    # images are 0-255; default (bf16) matmul precision on TPU gives ~1
    # intensity-unit error per tap, which perturbs min-eig gating and LK
    # convergence. f32 MXU passes keep the contraction bit-comparable to
    # the gather-based bilinear reference.
    for img in imgs:
        t1 = jnp.einsum("fxw,hw->fxh", Rx, img,
                        precision=jax.lax.Precision.HIGHEST)
        out.append(jnp.einsum("fyh,fxh->fyx", Ry, t1,
                              precision=jax.lax.Precision.HIGHEST))
    return out


@partial(jax.jit, static_argnames=("half", "iters", "min_eig", "margin"))
def _lk_level(img0, ix0, iy0, img1, pts, guess, half=10, iters=10,
              min_eig=1e-4, margin=1):
    """One pyramid level of LK for all points. pts/guess in THIS level's
    pixels. Returns (new_guess, ok, err)."""
    H, W = img0.shape
    P2 = (2 * half + 1) ** 2
    t, gx, gy = _sample_patches([img0, ix0, iy0], pts[:, 0], pts[:, 1], half)
    gxx = jnp.sum(gx * gx, axis=(1, 2))
    gxy = jnp.sum(gx * gy, axis=(1, 2))
    gyy = jnp.sum(gy * gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    mineig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    ok_g = mineig / P2 > min_eig
    inv = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)

    def body(_, v):
        (cur,) = _sample_patches([img1], pts[:, 0] + v[:, 0],
                                 pts[:, 1] + v[:, 1], half)
        d = cur - t
        bx = jnp.sum(d * gx, axis=(1, 2))
        by = jnp.sum(d * gy, axis=(1, 2))
        dv = -inv[:, None] * jnp.stack([gyy * bx - gxy * by,
                                        gxx * by - gxy * bx], axis=1)
        return v + dv

    v = jax.lax.fori_loop(0, iters, body, guess - pts)
    (cur,) = _sample_patches([img1], pts[:, 0] + v[:, 0],
                             pts[:, 1] + v[:, 1], half)
    err = jnp.mean(jnp.abs(cur - t), axis=(1, 2))
    newp = pts + v
    # patch sampling clamps at borders, so only a small margin is
    # required per level; the caller applies the strict half-window
    # margin at the finest level (OpenCV-equivalent behavior — a point
    # near the border of a COARSE level is still trackable).
    inb = ((newp[:, 0] >= margin) & (newp[:, 0] < W - margin)
           & (newp[:, 1] >= margin) & (newp[:, 1] < H - margin))
    return newp, ok_g & inb, err


def lk_track(pyr0: list[jax.Array], pyr1: list[jax.Array], pts: jax.Array,
             valid: jax.Array, guess: jax.Array | None = None,
             half: int = 10, iters: int = 10) -> LKResult:
    """Pyramidal LK: track level-0 pixel points pts (N, 2) from pyr0 to pyr1.

    guess: optional (N, 2) motion-prediction seed at level 0 (reference:
    feature_tracker.cpp:112-133 uses predicted points when available)."""
    L = len(pyr0)
    if guess is None:
        guess = pts
    g = guess / (2 ** (L - 1))
    ok_all = jnp.ones(pts.shape[0], bool)
    err = jnp.zeros(pts.shape[0], pyr0[0].dtype)
    for lvl in range(L - 1, -1, -1):
        scale = 2 ** lvl
        ix, iy = _scharr(pyr0[lvl])
        g, ok, err = _lk_level(pyr0[lvl], ix, iy, pyr1[lvl],
                               pts / scale, g, half=half, iters=iters,
                               margin=half if lvl == 0 else 1)
        ok_all = ok_all & ok
        if lvl > 0:
            g = g * 2.0
    return LKResult(pts=g, status=ok_all & valid, err=err)


def lk_track_fb(pyr0, pyr1, pts, valid, guess=None, half=10, iters=10,
                fb_thresh=0.5) -> LKResult:
    """LK with forward-backward consistency check <= fb_thresh px
    (reference: flow_back, feature_tracker.cpp:135-151). The backward pass
    runs on a single pyramid level seeded at the original points, exactly
    like the reference's cv::calcOpticalFlowPyrLK(..., maxLevel=1,
    OPTFLOW_USE_INITIAL_FLOW) — and it halves the gather cost, the TPU
    bottleneck of this kernel."""
    fwd = lk_track(pyr0, pyr1, pts, valid, guess, half, iters)
    bwd = lk_track(pyr1[:1], pyr0[:1], fwd.pts, fwd.status, pts, half, iters)
    dist = jnp.linalg.norm(bwd.pts - pts, axis=-1)
    ok = fwd.status & bwd.status & (dist <= fb_thresh)
    return LKResult(pts=fwd.pts, status=ok, err=fwd.err)


# ---------------------------------------------------------------------------
# Fused per-frame tracking program (serving path)
# ---------------------------------------------------------------------------


def _greedy_mask(pts, status, priority, min_dist, shape):
    """Device-side greedy min-distance suppression preferring long tracks
    (reference: feature_tracker.cpp:55-84 — iterate tracks by descending
    track count, keep a point iff its pixel is unmasked, then mask its
    min_dist neighborhood). Sequential by construction; runs as a fori_loop
    over the N slots inside the fused program. The masked square is shifted
    (not clipped) within min_dist of the border — detection excludes the
    border anyway. Returns (keep (N,) bool, occupancy (H, W) bool)."""
    H, W = shape
    N = pts.shape[0]
    side = 2 * min_dist + 1
    patch = jnp.ones((side, side), bool)
    # invalid/failed slots sort last and are never kept
    order = jnp.argsort(jnp.where(status, -priority, jnp.iinfo(jnp.int32).max))

    def body(i, carry):
        occ, keep = carry
        s = order[i]
        x = jnp.clip(jnp.round(pts[s, 0]).astype(jnp.int32), 0, W - 1)
        y = jnp.clip(jnp.round(pts[s, 1]).astype(jnp.int32), 0, H - 1)
        free = jnp.logical_and(status[s],
                               jnp.logical_not(occ[y, x]))
        y0 = jnp.clip(y - min_dist, 0, H - side)
        x0 = jnp.clip(x - min_dist, 0, W - side)
        blk = jax.lax.dynamic_slice(occ, (y0, x0), (side, side))
        occ = jax.lax.dynamic_update_slice(
            occ, jnp.where(free, patch | blk, blk), (y0, x0))
        keep = keep.at[s].set(free)
        return occ, keep

    occ0 = jnp.zeros((H, W), bool)
    keep0 = jnp.zeros((N,), bool)
    occ, keep = jax.lax.fori_loop(0, N, body, (occ0, keep0))
    return keep, occ


@partial(jax.jit, static_argnames=("levels", "half", "iters", "min_dist",
                                   "fb_thresh", "stereo", "det_stereo"))
def track_frame(prev_pyr, img0_u8, img1_u8, pts, valid, guess, priority,
                levels=4, half=10, iters=10, min_dist=10, fb_thresh=0.5,
                stereo=True, det_stereo=32):
    """ONE jitted program for a full tracker frame: build the new pyramid,
    pyramidal LK prev->cur with forward-backward check, greedy min-distance
    suppression, Shi-Tomasi replenishment candidates, and (stereo) the
    left->right LK — the whole per-frame device work of the reference's
    trackImage (feature_tracker.cpp:94-302) in a single dispatch.

    The r3 serving path jitted each LK level separately (5 dispatches per
    LK pass) plus pyramid/detect programs: >=13 round-trips/frame, 397 ms
    through the TPU relay vs the 66 ms camera budget. Fusing makes the
    per-frame cost one dispatch + one small fetch.

    prev_pyr: tuple of L arrays from the previous call (device-resident;
      pass the returned `pyr0`). Images enter as uint8 (4x cheaper on the
      host->device link than f32).
    Returns dict: pts (N,2), keep (N,), err (N,), det_pts (N,2), det_ok
      (N,), r_pts (N+det_stereo,2), r_ok (N+det_stereo,), pyr0 (tuple,
      carry to next call). The stereo pass covers BOTH the kept tracked
      points (rows [0:N]) and the top-`det_stereo` replenishment
      candidates (rows [N:N+det_stereo], aligned with det_pts[:det_stereo]
      — top_k orders detections by score, the same order the host adopts
      them), so a newly detected feature gets its right-camera observation
      in the SAME frame — the reference matches stereo after replenishment
      (trackImage runs the left->right LK on cur_pts, which already
      includes the new detections, feature_tracker.cpp:202-245), and the
      estimator stereo-triangulates a feature's depth from its first
      observation. The r4 fused kernel ran stereo on tracked points only,
      delaying depth init one frame per feature. det_stereo bounds the
      extra stereo-LK cost: steady-state replenishment is ~5-20
      points/frame, and a full 2N stereo set measured +38 ms/frame.
    """
    img0 = img0_u8.astype(jnp.float32)
    pyr0 = tuple(build_pyramid(img0, levels))
    fwd = lk_track_fb(list(prev_pyr), list(pyr0), pts, valid, guess,
                      half=half, iters=iters, fb_thresh=fb_thresh)
    keep, occ = _greedy_mask(fwd.pts, fwd.status, priority, min_dist,
                             img0.shape)
    det_pts, det_ok = _detect_with_occ(pyr0[0], occ, pts.shape[0], min_dist)
    ds = min(det_stereo, pts.shape[0])
    s_pts = jnp.concatenate([fwd.pts, det_pts[:ds]], axis=0)
    s_val = jnp.concatenate([keep, det_ok[:ds]], axis=0)
    if stereo:
        img1 = img1_u8.astype(jnp.float32)
        pyr1 = tuple(build_pyramid(img1, levels))
        right = lk_track_fb(list(pyr0), list(pyr1), s_pts, s_val,
                            half=half, iters=iters, fb_thresh=fb_thresh)
        r_pts, r_ok = right.pts, right.status
    else:
        r_pts, r_ok = s_pts, jnp.zeros_like(s_val)
    return dict(pts=fwd.pts, keep=keep, err=fwd.err, det_pts=det_pts,
                det_ok=det_ok, r_pts=r_pts, r_ok=r_ok, pyr0=pyr0)


# ---------------------------------------------------------------------------
# Shi-Tomasi detection (cv::goodFeaturesToTrack equivalent)
# ---------------------------------------------------------------------------

def shi_tomasi(img: jax.Array, win: int = 3) -> jax.Array:
    """(H, W) min-eigenvalue corner response over a (2*win+1)^2 window."""
    ix, iy = _scharr(img.astype(jnp.float32))

    def box(a):
        k = 2 * win + 1
        p = jnp.pad(a, win, mode="edge")
        out = jnp.zeros_like(a)
        for dy in range(k):
            for dx in range(k):
                out = out + p[dy : dy + a.shape[0], dx : dx + a.shape[1]]
        return out / (k * k)

    gxx = box(ix * ix)
    gxy = box(ix * iy)
    gyy = box(iy * iy)
    tr = gxx + gyy
    det = gxx * gyy - gxy * gxy
    return 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))


def _maxpool(score: jax.Array, radius: int) -> jax.Array:
    lo = (jnp.iinfo(score.dtype).min if jnp.issubdtype(score.dtype, jnp.integer)
          else -jnp.inf)
    p = jnp.pad(score, radius, mode="constant", constant_values=lo)
    out = score
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            out = jnp.maximum(
                out, p[dy : dy + score.shape[0], dx : dx + score.shape[1]])
    return out


@partial(jax.jit, static_argnames=("max_new", "min_dist", "border"))
def detect_features(img: jax.Array, occupied: jax.Array, max_new: int,
                    min_dist: int = 10, border: int = 12,
                    quality: float = 0.01):
    """Top-`max_new` Shi-Tomasi corners with non-max suppression and an
    occupancy mask (existing tracks + their min_dist neighborhoods), the
    static-shape counterpart of the reference's mask+goodFeaturesToTrack
    (feature_tracker.cpp:55-84, 177-195).

    occupied: (H, W) bool — True where new detections are forbidden.
    Returns (pts (max_new, 2) float32 (x, y), ok (max_new,) bool)."""
    return _detect_with_occ(img, occupied, max_new, min_dist, border, quality)


def _detect_with_occ(img, occupied, max_new, min_dist, border=12,
                     quality=0.01):
    H, W = img.shape
    score = shi_tomasi(img)
    yy, xx = jnp.mgrid[0:H, 0:W]
    # exact NMS with tie-breaking: corner responses plateau (checkerboards),
    # and a >=-only NMS keeps whole plateaus. Quantize the score to int32 and
    # argmax-by-index among window ties (two integer maxpools) — survivors are
    # then strictly > min_dist apart (two within range would each have to
    # dominate the other).
    si = jnp.round(score / jnp.maximum(jnp.max(score), 1e-30)
                   * 1e6).astype(jnp.int32)
    idx32 = (xx + W * yy).astype(jnp.int32)
    m1 = _maxpool(si, min_dist)
    m2 = _maxpool(jnp.where(si == m1, idx32, -1), min_dist)
    nms = (si == m1) & (idx32 == m2)
    # block detections near occupied pixels
    occ = _maxpool(jnp.where(occupied, 1.0, 0.0), min_dist) > 0
    inb = ((xx >= border) & (xx < W - border)
           & (yy >= border) & (yy < H - border))
    good = nms & inb & (~occ) & (score > quality * jnp.max(score))
    flat = jnp.where(good, score, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_new)
    pts = jnp.stack([(idx % W).astype(jnp.float32),
                     (idx // W).astype(jnp.float32)], -1)
    return pts, vals > -jnp.inf

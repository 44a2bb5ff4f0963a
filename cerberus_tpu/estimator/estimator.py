"""Sliding-window VILO estimator: host orchestration over device kernels.

Re-design of the reference's Estimator class
(reference: src/estimator/estimator.{h,cpp}): the callback-driven, mutex-
guarded C++ state machine becomes a thin host loop that (a) buffers sensor
samples per inter-keyframe interval, (b) calls jitted device functions for
preintegration and the window solve, and (c) performs the discrete
keyframe / marginalize / slide decisions that cannot live under jit.

Pipeline per camera frame (reference: processMeasurements + processImage,
estimator.cpp:400-846):
  1. drain the 500 Hz IMU+leg buffer into the newest interval, preintegrate
     on device (one lax.scan)                         [processIMULeg]
  2. feature bookkeeping + keyframe decision          [addFeatureCheckParallax]
  3. INITIAL phase: dead-reckon pose, triangulate; at frame 10 run the
     window solve with biases free (the solve replaces solveGyroscopeBias +
     repropagate: one solver path instead of a special-cased initializer),
     then re-preintegrate all intervals at the solved biases
  4. NON_LINEAR: triangulate new features, pack WindowData, LM solve on
     device, outlier rejection, marginalize (old / second-new), slide.
"""

from __future__ import annotations

import functools as _functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from cerberus_tpu import config as C
from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.estimator.feature_manager import FeatureManager
from cerberus_tpu.estimator.packing import (build_window_data, coerce_preints,
                                            default_free_mask, pad_features,
                                            pack_window_data, zero_prior)
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops import marginalize as marg
from cerberus_tpu.ops.preintegration import (PreintParams,
                                             il_preintegrate_parallel)
from cerberus_tpu.ops.solver import SolveOptions, solve_window
from cerberus_tpu.utils import lie

NF = C.NUM_FRAMES
MARGIN_OLD, MARGIN_SECOND_NEW = 0, 1


@_functools.lru_cache(maxsize=None)
def _preint_kernel(contact_sensor_type: int):
    """Shared preintegration kernel per contact model (the contact type
    selects a Python-level branch inside il_preintegrate, so it must stay
    static — the remaining PreintParams fields are traced arrays)."""
    def f(dt, acc, gyr, phi, dphi, c, mask, ba, bg, rho, params, ff_init):
        params = params._replace(contact_sensor_type=contact_sensor_type)
        return il_preintegrate_parallel(
            dt, acc, gyr, phi, dphi, c, mask, ba, bg, rho,
                               params, ff_init=ff_init)
    return jax.jit(f)


@_functools.lru_cache(maxsize=None)
def _shared_kernels(max_iters: int) -> dict:
    """Process-wide jitted kernels, one set per solver iteration budget."""
    opts = SolveOptions(max_iters=max_iters)

    def _solve_scored(st, data):
        # solve + outlier scoring fused in ONE program: a separate reproj
        # dispatch costs a full relay round-trip per frame in streaming mode
        new_st, info = solve_window(st, data, opts)
        errs = fac.feature_reproj_errors(new_st, data)
        return new_st, info, errs

    return dict(
        solve=jax.jit(lambda st, data: solve_window(st, data, opts)),
        solve_scored=jax.jit(_solve_scored),
        solve_init=jax.jit(
            lambda st, data: solve_window(st, data,
                                          SolveOptions(max_iters=20))),
        marg_old=jax.jit(marg.marginalize_old),
        marg_new=jax.jit(marg.marginalize_second_new),
        reproj=jax.jit(fac.feature_reproj_errors),
    )


@_functools.lru_cache(maxsize=None)
def _streaming_kernel(max_iters: int, mode: str, use_leg_odom: bool,
                      marg_td_info: bool, ct: int = 0, S9: int = 0,
                      S8: int = 0):
    """ONE fused device program per NON_LINEAR frame: newest-interval
    preintegration -> pack (WindowData assembly) -> LM solve -> outlier
    scoring -> in-device 3 px gating -> marginalization -> prior
    frame-shift -> (non-keyframe) spliced re-preintegration.

    The r2 streaming path issued >=4 dispatches per frame (stack_preints,
    solve_scored, marginalize, plus a blocking device_get in
    _propagate_frame); through a relayed TPU each extra dispatch costs a
    ~25 ms round-trip, which alone broke the 66 ms camera budget
    (reference real-time knobs: max_solver_time 0.1 s,
    estimator.cpp:1226-1233). r3 still dispatched the newest-interval
    preintegration (and the MARGIN_SECOND_NEW splice) separately; r4 folds
    both in, making every steady-state frame exactly one dispatch plus one
    small blocking fetch.

    mode: 'old' (MARGIN_OLD), 'new' (MARGIN_SECOND_NEW with a live prior),
    'none' (no marginalization: MARGIN_SECOND_NEW without a prior).
    ct: contact sensor type (static — selects a Python branch in
      il_preintegrate; the pattern of _preint_kernel).
    S9: padded sample count of the newest interval's raw buffer; 0 =
      don't fold (interval preintegrated by the caller or absent).
    S8: padded sample count of the merged interval-8+9 buffer for the
      MARGIN_SECOND_NEW splice (reference: estimator.cpp:1567-1652); 0 =
      no splice fold."""
    opts = SolveOptions(max_iters=max_iters)

    def _fold_preint(raw, pres, slot, ba, bg, rho, params):
        """In-program il_preintegrate of a raw padded buffer, threading the
        adaptive foot-force tracker from the previous interval's preint
        (ILPreint.ff_* docstring; prev slot's zero placeholder reproduces
        the cold start the eager path used when prev was None)."""
        prev = pres[slot - 1]
        ff = (prev.ff_min, prev.ff_max, prev.ff_window, prev.ff_idx)
        return il_preintegrate_parallel(
            raw["dt"], raw["acc"], raw["gyr"], raw["phi"], raw["dphi"],
            raw["c"], raw["mask"], ba, bg, rho, params, ff_init=ff)

    def step(st0, pres, ivalid, feats_pad, prior, free_mask, gravity, calib,
             raw9, raw8, params):
        params = params._replace(contact_sensor_type=ct)
        dtype = st0.p.dtype
        pre9 = None
        if S9:
            pre9 = _fold_preint(raw9, pres, 9, st0.ba[9], st0.bg[9],
                                st0.rho[9], params)
            pres = tuple(pres[:9]) + (pre9,)
        data = build_window_data(
            pres, ivalid, feats_pad, prior, free_mask, gravity, calib,
            use_leg_odom=use_leg_odom, cov_jitter=1e-14, dtype=dtype)
        st, info = solve_window(st0, data, opts)
        errs = fac.feature_reproj_errors(st, data)
        # per-feature average reprojection gate — the reference's own rule
        # (ave_err * FOCAL_LENGTH > 3, estimator.cpp:1794-1796) applied
        # in-device so marginalization sees the gated feature set without
        # a host round-trip
        gate = data.f_valid & (errs * C.FOCAL_LENGTH > 3.0)
        data2 = data._replace(f_valid=data.f_valid & ~gate)
        out = dict(st=st, info=info, errs=errs)
        if pre9 is not None:
            out["pre9"] = pre9
        if mode != "none":
            if mode == "old":
                pj, pr, valid = marg.marginalize_old(st, data2)
                lin = _shift_state(st)
            else:
                pj, pr, valid = marg.marginalize_second_new(st, data2)
                lin = _shift_state_second_new(st)
            if not marg_td_info:
                pj = pj.at[:, fac.TD_OFF].set(0.0)
            # fold validity in-device (zeroed prior == skipped prior,
            # reference estimator.cpp:1107) — bool(valid) would block the
            # host on the whole program
            pj = jnp.where(valid, pj, 0.0)
            pr = jnp.where(valid, pr, 0.0)
            out["prior"] = (pj, pr, lin, valid)
        if S8:
            # spliced interval 8+9 re-preintegration at the SOLVED frame-8
            # linearization (the eager _slide_new used post-adopt values —
            # identical numbers)
            out["pre8m"] = _fold_preint(raw8, pres, 8, st.ba[8], st.bg[8],
                                        st.rho[8], params)
        return out

    return jax.jit(step)


@dataclass
class IntervalBuffer:
    """Raw 500 Hz samples of one inter-keyframe interval (incl. boundary
    sample shared with the previous interval)."""
    t: list = field(default_factory=list)
    acc: list = field(default_factory=list)
    gyr: list = field(default_factory=list)
    phi: list = field(default_factory=list)
    dphi: list = field(default_factory=list)
    c: list = field(default_factory=list)

    def append(self, t, acc, gyr, phi, dphi, c):
        self.t.append(t)
        self.acc.append(np.asarray(acc))
        self.gyr.append(np.asarray(gyr))
        self.phi.append(np.asarray(phi))
        self.dphi.append(np.asarray(dphi))
        self.c.append(np.asarray(c))

    def __len__(self):
        return len(self.t)


class PySensorSync:
    """Pure-Python fallback of native.SensorSync with IDENTICAL extract
    semantics: all samples in (t0, t1], plus boundary samples lerped to
    exactly t0 / t1 when neighbors exist (contacts snap to the nearest
    sample). Mirrors native/sensor_sync.cpp::sync_extract, itself modeled on
    the reference's boundary interpolation (utility.cpp:24-104
    lerpGyro/lerpLegSensors used by getIMUAndLegInterval,
    estimator.cpp:303-397)."""

    COLS = 35  # t, acc3, gyr3, phi12, dphi12, contact4

    def __init__(self, capacity: int = 1 << 20):
        self.buf: list[np.ndarray] = []
        self.capacity = capacity

    def push(self, t, acc, gyr, phi, dphi, contact):
        row = np.empty(self.COLS)
        row[0] = t
        row[1:4] = acc
        row[4:7] = gyr
        row[7:19] = phi
        row[19:31] = dphi
        row[31:35] = contact
        self.buf.append(row)
        if len(self.buf) > self.capacity:
            del self.buf[: len(self.buf) - self.capacity]

    def latest_time(self) -> float:
        return self.buf[-1][0] if self.buf else -1.0

    @staticmethod
    def _lerp(a, b, t):
        w = (t - a[0]) / (b[0] - a[0] + 1e-18)
        out = a + (b - a) * w
        out[0] = t
        out[31:35] = a[31:35] if w < 0.5 else b[31:35]  # snap flags
        return out

    def extract(self, t0: float, t1: float, max_out: int = 4096):
        """Rows (n, 35) for (t0, t1] with boundary lerp, or None if the
        stream has not yet reached t1. Consumes rows older than the last
        interval so the next extract can still boundary-interpolate."""
        if not self.buf or self.buf[-1][0] < t1:
            return None
        rows = []
        i, n = 0, len(self.buf)
        prev = None
        while i < n and self.buf[i][0] <= t0:
            prev = self.buf[i]
            i += 1
        if prev is not None and i < n:
            rows.append(self._lerp(prev, self.buf[i], t0))
        while i < n and self.buf[i][0] <= t1:
            rows.append(self.buf[i])
            prev = self.buf[i]
            i += 1
        if i < n and prev is not None and prev[0] < t1:
            rows.append(self._lerp(prev, self.buf[i], t1))
        if i > 1:
            del self.buf[: i - 1]
        if len(rows) > max_out:
            rows = rows[:max_out]
        return np.stack(rows) if rows else np.zeros((0, self.COLS))


class Estimator:
    INITIAL, NON_LINEAR = 0, 1

    def __init__(self, cfg: EstimatorConfig | None = None,
                 max_samples: int = 128, dtype=jnp.float64,
                 use_native: bool | None = None, pipeline: bool = True):
        # max_samples: padded per-interval sample capacity for the
        # preintegration scan. At 500 Hz / 15 Hz an interval holds ~34
        # samples; MARGIN_SECOND_NEW merges consecutive non-keyframe
        # intervals, so 128 covers ~3 merges. The scan is SEQUENTIAL —
        # its length sits directly on the streaming latency path (measured
        # 58 ms at S=256 vs 33 ms at S=64 on v5e) — so don't oversize it.
        # Overflow truncates the oldest samples (reference keeps unbounded
        # std::vectors, estimator.h:141-149).
        self.cfg = cfg or EstimatorConfig()
        self.dtype = dtype
        self.S = max_samples
        self.pipeline = pipeline
        self.params = PreintParams.from_config(self.cfg, dtype)
        self.F = self.cfg.max_features
        # native C++ ring-buffer ingestion + time-sync (cerberus_tpu/native.py)
        from cerberus_tpu import native as _native
        if use_native is None:
            use_native = _native.available()
        self.use_native = bool(use_native and _native.available())

        self.fm = FeatureManager(self.F, self.cfg.min_parallax)
        self.clear_state()

        # jitted device kernels — SHARED across Estimator instances (module
        # cache keyed by iteration budget; jax.jit then dedups on arg
        # shapes/dtypes). Per-instance closures would recompile the full
        # solver for every new Estimator — the round-1 test suite spent most
        # of its >25 min doing exactly that.
        k = _shared_kernels(self.cfg.max_num_iterations)
        self._preint_k = _preint_kernel(self.cfg.contact_sensor_type)
        self._solve = k["solve"]
        self._solve_scored = k["solve_scored"]
        self._solve_init = k["solve_init"]
        self._marg_old = k["marg_old"]
        self._marg_new = k["marg_new"]
        self._reproj_err = k["reproj"]

    def _preint(self, dt, acc, gyr, phi, dphi, c, mask, ba, bg, rho,
                ff_init=None):
        if ff_init is None:
            z = np.zeros
            ff_init = (z(4), z(4), z((4, C.FOOT_VAR_WINDOW_SIZE)),
                       z(4, np.int32))
        return self._preint_k(dt, acc, gyr, phi, dphi, c, mask, ba, bg, rho,
                              self.params, ff_init)

    # ------------------------------------------------------------------
    def clear_state(self):
        """Full reboot (reference: clearState, estimator.cpp:24-110)."""
        cfg = self.cfg
        ric, tic = cfg.ric_tic(n=2)  # state always holds 2 cams (mono masks)
        self.p = np.zeros((NF, 3))
        self.q = np.tile([1.0, 0, 0, 0], (NF, 1))
        self.v = np.zeros((NF, 3))
        self.ba = np.zeros((NF, 3))
        self.bg = np.zeros((NF, 3))
        self.rho = np.tile(cfg.robot.rho_init(), (NF, 1))
        self.tic = tic.copy()
        self.qic = np.stack([_rot_to_quat_np(ric[i]) for i in range(2)])
        self.td = cfg.td
        self.headers = np.zeros(NF)

        self.frame_count = 0
        self.solver_flag = self.INITIAL
        self.first_imu = False
        self.open_ex_estimation = False

        self.buffers: list[IntervalBuffer | None] = [None] * 10
        self.preints = [None] * 10
        self.prior = None          # (J, r, lin_state)
        self.prev_img_t = None
        self._pending = None       # in-flight dispatched solve (pipeline)
        self._pending_frames = []  # frames waiting for proprio to reach t+td
        self._last_raw = None      # (acc, gyr) of the newest pushed sample
        if getattr(self, "use_native", False):
            from cerberus_tpu.native import SensorSync
            self.sync = SensorSync()
        else:
            self.sync = PySensorSync()
        self.fm = FeatureManager(self.F, self.cfg.min_parallax)

        # IMU-rate fast prediction state (reference: fastPredictIMU)
        self.latest = None
        self._last_pose = None
        self.keyframe_callback = None  # fn(t, p, q, ids, {id: (uv, world)})
        self.metrics = getattr(self, "metrics", None)  # MetricsLogger | None
        self.predict_callback = None   # fn({feature_id: pts_cam(3,)})
        self.predicted_pts: dict[int, np.ndarray] = {}
        # reboots survives clear_state so replays can report recovery events
        # (reference: failureDetection -> clearState, estimator.cpp:823-831)
        prev_stats = getattr(self, "stats", {})
        self.stats = {"solves": 0, "solve_time": 0.0, "keyframes": 0,
                      "reboots": prev_stats.get("reboots", 0),
                      "dispatches": 0}
        if "failure_reasons" in prev_stats:
            self.stats["failure_reasons"] = prev_stats["failure_reasons"]

        # static per-config streaming-kernel arguments (host numpy)
        cw = np.zeros(13)
        if cfg.ex_prior_sigma_t > 0:
            cw[[0, 1, 2, 6, 7, 8]] = 1.0 / cfg.ex_prior_sigma_t
        if cfg.ex_prior_sigma_r > 0:
            cw[[3, 4, 5, 9, 10, 11]] = 1.0 / cfg.ex_prior_sigma_r
        if cfg.td_prior_sigma > 0:
            cw[12] = 1.0 / cfg.td_prior_sigma
        ric_ref, tic_ref = cfg.ric_tic(n=2)
        qic_ref = np.stack([_rot_to_quat_np(ric_ref[i]) for i in range(2)])
        self._calib_base = (tic_ref, qic_ref, cw)
        self._gravity = np.array([0.0, 0.0, cfg.g_norm])

    @property
    def _calib(self):
        """Calibration prior for the solve. Extrinsics anchor at the
        factory calibration (an absolute measurement the config carries);
        td anchors at the RUNNING estimate — a per-solve damper, not an
        absolute anchor. The reference has no absolute td prior at all (td
        is a free Ceres block, estimator.cpp:1097-1105); anchoring at
        cfg.td biased a mis-set initial offset: a +20 ms td error
        converged to only ~3 ms with the fixed anchor (1.5% drift) vs
        ~0 ms with the damper."""
        tic_ref, qic_ref, cw = self._calib_base
        return (tic_ref, qic_ref, self.td, cw)

    # ------------------------------------------------------------------
    def input_imu_leg(self, t, acc, gyr, phi, dphi, contact):
        """500 Hz proprioceptive tick (reference: inputIMU + inputLeg,
        estimator.cpp:255-300)."""
        self.sync.push(t, acc, gyr, phi, dphi, contact)
        self._last_raw = (np.asarray(acc, float), np.asarray(gyr, float))
        if self.latest is not None:
            self._fast_predict(t, np.asarray(acc), np.asarray(gyr))
        # drain frames that were waiting for the proprio stream to reach
        # their exposure instant t_img + td (reference: processMeasurements
        # spin-waits on IMUAvailable(curTime), estimator.cpp:414-429; the
        # callback-driven equivalent is deferring the frame to the sensor
        # tick that completes its interval). Without this, a positive td
        # asks extract() for future samples, every interval closes empty,
        # and the estimator silently degrades to vision-only.
        while (self._pending_frames
               and self.sync.latest_time() >= self._pending_frames[0][0]
               + self.td):
            t_img, feats = self._pending_frames.pop(0)
            self._process_image(t_img, feats)

    def _fast_predict(self, t, acc, gyr):
        """IMU-rate forward propagation of the newest state
        (reference: fastPredictIMU, estimator.cpp:1800-1840)."""
        L = self.latest
        dt = t - L["t"]
        if dt <= 0:
            return
        g = np.array([0, 0, self.cfg.g_norm])
        q = L["q"]
        un_acc_0 = _rot_np(q, L["acc"] - L["ba"]) - g
        un_gyr = 0.5 * (L["gyr"] + gyr) - L["bg"]
        q = _quat_mul_np(q, _delta_q_np(un_gyr * dt))
        un_acc_1 = _rot_np(q, acc - L["ba"]) - g
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        L["p"] = L["p"] + dt * L["v"] + 0.5 * dt * dt * un_acc
        L["v"] = L["v"] + dt * un_acc
        L["q"], L["t"], L["acc"], L["gyr"] = q, t, acc, gyr

    # ------------------------------------------------------------------
    def input_image(self, t, feats: dict):
        """15 Hz camera tick. feats: {id: (pt0(3,), vel0(2,), pt1|None, vel1)}.

        If the proprioceptive stream has not yet reached the frame's
        exposure instant t + td (positive td: the image clock leads the
        IMU clock), the frame is queued and processed from the sensor tick
        that completes its interval (see input_imu_leg)."""
        if (self.cfg.use_imu and self.frame_count > 0
                and self.sync.latest_time() < t + self.td):
            self._pending_frames.append((t, feats))
            self.stats["deferred_frames"] = \
                self.stats.get("deferred_frames", 0) + 1
            # bounded deferral: a permanently stalled proprio stream must
            # degrade to vision-only processing, not freeze all output
            # behind an unbounded queue. Past ~10 frames (0.7 s of camera
            # at 15 Hz — far beyond any legitimate td), process the oldest
            # frame anyway: its interval extract comes up empty, so the
            # frame rides vision (PnP fallback), the pre-deferral behavior.
            if len(self._pending_frames) > 10:
                t_old, f_old = self._pending_frames.pop(0)
                self.stats["stalled_frames"] = \
                    self.stats.get("stalled_frames", 0) + 1
                self._process_image(t_old, f_old)
            return
        self._process_image(t, feats)

    def _process_image(self, t, feats: dict):
        # adopt the previous frame's in-flight solve FIRST: the deferred
        # slide must consume buffers/preints before this frame's
        # _close_interval overwrites them
        self._finish_pending()
        fc = self.frame_count
        if not self.cfg.stereo:
            # mono mode: drop right-cam observations (changeSensorType)
            feats = {fid: (o0, v0, None, v1)
                     for fid, (o0, v0, o1, v1) in feats.items()}
        # 1. interval measurements + preintegration + state propagation.
        # The interval is drained to t + td (the exposure instant under the
        # RUNNING time-offset estimate — reference: curTime = t + td,
        # estimator.cpp:414), which is what makes recording cur_td per
        # observation consistent: the projection factor then only corrects
        # by the CHANGE (td - cur_td) since registration.
        if fc > 0:
            k = fc - 1 if self.solver_flag == self.INITIAL else 9
            self._close_interval(
                k, t + self.td,
                defer_preint=(self.solver_flag == self.NON_LINEAR
                              and self.cfg.use_imu))
            stale = self.cfg.use_imu and self._imu_stale(self.buffers[k])
            if stale:
                # hung IMU driver (identical consecutive samples — a real
                # IMU's noise floor makes exact repeats impossible):
                # dead-reckoning and the IMU+leg factor would integrate
                # confidently-wrong data, so the interval's inertial factor
                # is dropped and the frame rides vision (PnP fallback) —
                # the reference has no such guard and integrates the hang.
                self.stats["stale_imu_intervals"] = \
                    self.stats.get("stale_imu_intervals", 0) + 1
                if self.solver_flag != self.NON_LINEAR:
                    self.preints[k] = None
            elif self.cfg.use_imu:
                self._propagate_frame(k)
            else:
                # no dead-reckoning available: seed with previous pose,
                # PnP below refines (reference vision-only path,
                # estimator.cpp:806-808)
                j = (fc if self.solver_flag == self.INITIAL
                     else C.WINDOW_SIZE)
                for arr in (self.p, self.q, self.v):
                    arr[j] = arr[j - 1]
        elif self.cfg.use_imu:
            # consume the pending buffer up to t for gravity alignment
            self._init_first_pose(t)
        else:
            self.prev_img_t = t
        self.headers[min(fc, NF - 1)] = t

        # 2. feature bookkeeping + keyframe decision. Each observation
        # records cur_td = the running td estimate at registration time, so
        # the projection factor's (td - cur_td) velocity compensation uses
        # the CHANGE in td since the observation was made (reference:
        # FeaturePerFrame stores cur_td, feature_manager.h:33-46; factor
        # uses td - td_i, projectionTwoFrameOneCamFactor.cpp:59-74).
        is_kf = self.fm.add_frame(min(fc, NF - 1), feats, self.td)
        margin_flag = MARGIN_OLD if is_kf else MARGIN_SECOND_NEW
        if is_kf:
            self.stats["keyframes"] += 1

        ric, tic_, p_w, R_w = self._poses_np()
        if self.solver_flag == self.INITIAL:
            # per-frame PnP pose seeding during init — dead-reckoning with
            # uncalibrated biases is weak there (reference: estimator.cpp:736
            # calls initFramePoseByPnP each INITIAL frame before triangulate)
            fi = min(fc, NF - 1)
            if fi > 0:
                res = self.fm.init_frame_pose_by_pnp(fi, p_w, R_w, tic_, ric)
                if res is not None:
                    self.p[fi], R_w[fi] = res[0], res[1]
                    self.q[fi] = _rot_to_quat_np(res[1])
                    p_w[fi] = res[0]
            self.fm.triangulate(p_w, R_w, tic_, ric)
            if fc == C.WINDOW_SIZE:
                self._initialize()
                self._post_solve(margin_flag)
                self.solver_flag = self.NON_LINEAR
            else:
                self.frame_count += 1
                # replicate newest state (reference: estimator.cpp:793-804)
                for arr in (self.p, self.q, self.v, self.ba, self.bg, self.rho):
                    arr[self.frame_count] = arr[self.frame_count - 1]
        else:
            # vision-side pose init of the incoming frame. With IMU the
            # reference relies on dead-reckoning alone (PnP only when
            # !USE_IMU, estimator.cpp:806-808); here PnP additionally acts
            # as a RECOVERY path: adopt its pose when it disagrees strongly
            # with dead-reckoning (corrupted preintegration, IMU dropout).
            # As a watchdog it runs every 3rd frame (~200 ms recovery
            # latency) rather than every frame — the GN PnP costs ~7 ms of
            # host time, a large slice of the 66 ms real-time budget — and
            # ALWAYS when dead-reckoning is unavailable or suspect (no
            # IMU, stale interval).
            want_pnp = (not self.cfg.use_imu or stale
                        or (self.cfg.pnp_fallback
                            and self.stats["solves"] % 3 == 0))
            if want_pnp:
                res = self.fm.init_frame_pose_by_pnp(C.WINDOW_SIZE, p_w, R_w,
                                                     tic_, ric)
                if res is not None:
                    dp = np.linalg.norm(res[0] - self.p[C.WINDOW_SIZE])
                    dang = _rot_angle_np(
                        R_w[C.WINDOW_SIZE].T @ res[1])
                    # stale interval: dead-reckoning is ABSENT (the seed is
                    # the previous frame's pose), so PnP is the only
                    # odometry — adopt it unconditionally; the 0.3 m /
                    # 15 deg gate is only for the watchdog against healthy
                    # dead-reckoning
                    if not self.cfg.use_imu or stale or dp > 0.3 \
                            or dang > 0.26:
                        self.p[C.WINDOW_SIZE], R_w[C.WINDOW_SIZE] = res
                        self.q[C.WINDOW_SIZE] = _rot_to_quat_np(res[1])
                        p_w[C.WINDOW_SIZE] = res[0]
            self.fm.triangulate(p_w, R_w, tic_, ric)
            t0 = time.time()
            # ONE fused device program per frame: pack + solve + outlier
            # scoring + 3 px gating + marginalization + prior shift
            # (_streaming_kernel). The prior stays device-resident; the only
            # blocking fetch is the (state, errors, info) device_get below.
            feats_d, slots = self.fm.export()
            feats_pad = pad_features(feats_d, self.F)
            depths = self.fm.depth_vector(slots)
            st0 = self._window_state(depths)
            mode = ("old" if margin_flag == MARGIN_OLD
                    else ("new" if self.prior is not None else "none"))
            # newest-interval raw samples, preintegrated IN the kernel
            # (defer_preint path of _close_interval)
            raw9 = raw8 = None
            stale9 = self.cfg.use_imu and self._imu_stale(self.buffers[9])
            if self.cfg.use_imu and self.preints[9] is None \
                    and self.buffers[9] is not None and not stale9:
                raw9 = self._pad_buffer(self.buffers[9])
            if mode != "old" and self.cfg.use_imu and not stale9:
                # splice buffer for the post-solve MARGIN_SECOND_NEW slide
                # (reference: estimator.cpp:1567-1652), re-preintegrated in
                # the same program at the solved frame-8 linearization
                b8, b9 = self.buffers[8], self.buffers[9]
                if b8 is not None and b9 is not None and len(b8) \
                        and len(b9):
                    merged = IntervalBuffer()
                    for i in range(len(b8)):
                        merged.append(b8.t[i], b8.acc[i], b8.gyr[i],
                                      b8.phi[i], b8.dphi[i], b8.c[i])
                    for i in range(1, len(b9)):
                        merged.append(b9.t[i], b9.acc[i], b9.gyr[i],
                                      b9.phi[i], b9.dphi[i], b9.c[i])
                    self._merged_buffer = merged
                    raw8 = self._pad_buffer(merged)
            S9 = 0 if raw9 is None else len(raw9["dt"])
            S8 = 0 if raw8 is None else len(raw8["dt"])
            kernel = _streaming_kernel(self.cfg.max_num_iterations, mode,
                                       self.cfg.use_leg_odom,
                                       self.cfg.marg_td_info,
                                       self.cfg.contact_sensor_type, S9, S8)
            pres, ivalid = coerce_preints(
                self.preints if self.cfg.use_imu else [None] * 10,
                self.dtype)
            if S9:
                ivalid = ivalid.copy()
                ivalid[9] = True
            prior_t = self.prior if self.prior is not None \
                else zero_prior(self.F, self.dtype)
            free_mask = self._free_mask()
            self.stats["pack_time"] = self.stats.get("pack_time", 0.0) \
                + (time.time() - t0)
            if getattr(self, "debug", False):
                data_dbg, *_ = self._pack()
                self.last_debug = {"entry": _cost_breakdown(st0, data_dbg,
                                                            self.F)}
                if self.prior is not None:
                    dx = np.asarray(fac.local_diff(st0, self.prior[2]))
                    j = int(np.argmax(np.abs(dx)))
                    print(f"[prior-dx] |dx|={np.linalg.norm(dx):.2e} "
                          f"argmax dim {j} = {dx[j]:.2e}")
            t1 = time.time()
            out = kernel(st0, pres, ivalid, feats_pad, prior_t, free_mask,
                         self._gravity, self._calib, raw9, raw8, self.params)
            self.stats["dispatches"] = self.stats.get("dispatches", 0) + 1
            # the in-kernel preints stay device-resident for the next frame
            # (the deferred slide reads preints[9] before close_interval
            # overwrites it)
            if "pre9" in out:
                self.preints[9] = out["pre9"]
            # PIPELINED adoption: the dispatch returns immediately (jax
            # async); the blocking fetch + all post-solve host bookkeeping
            # run at the NEXT frame's entry (_finish_pending), so the
            # device computes this solve WHILE the host does the next
            # frame's input/feature work. Numerically identical solves —
            # only the fetch point moves. This mirrors the reference's own
            # async split: processMeasurements optimizes in a background
            # thread while outputs come from fastPredictIMU
            # (estimator.cpp:133-137, 1800-1840).
            self._pending = dict(out=out, slots=slots, feats_d=feats_d,
                                 margin_flag=margin_flag, t=t, t0=t0, t1=t1,
                                 is_kf=is_kf)
            if not self.pipeline:
                self._finish_pending()
                if self.solver_flag == self.INITIAL:   # reboot fired
                    return
        self._update_latest(t)

    def _finish_pending(self):
        """Blocking fetch + post-solve host bookkeeping of the previously
        dispatched frame (see the pipelined-adoption comment at the
        dispatch site). Runs at the next frame's entry, or from flush()."""
        pend = self._pending
        if pend is None:
            return
        self._pending = None
        out, slots, feats_d = pend["out"], pend["slots"], pend["feats_d"]
        margin_flag, t = pend["margin_flag"], pend["t"]
        t0, t1, is_kf = pend["t0"], pend["t1"], pend["is_kf"]
        tf = time.time()
        prior_out = out.get("prior")
        pre8m = out.get("pre8m")
        # ONE batched D2H (tunnel-friendly): state + outlier scores + solve
        # info; the new prior never leaves the device
        st_np, errs, info = jax.device_get((out["st"], out["errs"],
                                            out["info"]))
        self.stats["solve_only_time"] = \
            self.stats.get("solve_only_time", 0.0) + (time.time() - t1)
        self.stats["block_time"] = self.stats.get("block_time", 0.0) \
            + (time.time() - tf)
        self._adopt(st_np, slots, feats_d)
        self.last_info = info
        self.stats["solve_time"] += time.time() - t0
        self.stats["solves"] += 1
        if self.metrics is not None:
            self.metrics.log(
                "solve", t=float(t), cost0=float(info.cost0),
                cost=float(info.cost), accepted=int(info.accepted),
                solve_ms=round(1000 * (time.time() - t0), 2),
                block_ms=round(1000 * (time.time() - tf), 2),
                dispatches=self.stats.get("dispatches", 0),
                features=int(np.sum(feats_d["valid"])),
                keyframe=bool(is_kf), td=float(self.td))

        # host-side outlier bookkeeping — the SAME 3 px average-error rule
        # the kernel applied in-device before marginalizing
        # (reference: ave_err * FOCAL_LENGTH > 3, estimator.cpp:1794-96)
        errs = errs[: len(slots)]
        bad_local = [n for n in range(len(slots))
                     if feats_d["valid"][n]
                     and errs[n] * C.FOCAL_LENGTH > 3.0]
        self.fm.remove_outliers([slots[n] for n in bad_local])

        if self.predict_callback is not None:
            # feature prediction only feeds tracker seeding; without a
            # consumer it is ~3 ms/frame of dead host time
            self._predict_next_frame()
        if self.failure_detection():
            # system reboot (reference: estimator.cpp:823-831), with pose
            # continuity: the restarted estimator continues from the last
            # published pose (see _rebase_world)
            self.stats["reboots"] += 1
            if self.metrics is not None:
                self.metrics.log("reboot", t=float(t),
                                 count=self.stats["reboots"])
            self._rebase_world()
            self.clear_state()
            return
        if prior_out is not None:
            self.prior = prior_out
        self._emit_keyframe_and_slide(margin_flag, pre8m=pre8m)
        self.fm.remove_failures()

    def flush(self):
        """Adopt any in-flight solve (end of stream, before checkpointing,
        or before reading solved state externally)."""
        self._finish_pending()

    # ------------------------------------------------------------------
    def _init_first_pose(self, t):
        """Gravity-align the first frame (reference: initFirstIMUPose,
        estimator.cpp:524-544)."""
        t_ext = min(t, self.sync.latest_time())
        rows = self.sync.extract(-1e18, t_ext) if t_ext > -1e17 else None
        self.prev_img_t = t
        if rows is None or len(rows) == 0:
            return
        acc_mean = rows[:, 1:4].mean(axis=0)
        # g2R(acc): body->world rotation putting measured gravity on +z with
        # zero yaw (reference: initFirstIMUPose, estimator.cpp:524-544)
        R0 = np.asarray(lie.g_to_rot(jnp.asarray(acc_mean)))
        self.q[0] = _rot_to_quat_np(R0)

    def _close_interval(self, k: int, t_img, defer_preint: bool = False):
        """Move the samples spanning (prev image, this image] into interval
        k's buffer and preintegrate (reference: getIMUAndLegInterval,
        estimator.cpp:303-397).

        defer_preint: streaming path — leave preints[k] unset; the fused
        per-frame kernel preintegrates the raw buffer in-program (one
        dispatch per frame instead of two)."""
        rows = self.sync.extract(self.prev_img_t, t_img)
        self.prev_img_t = t_img
        buf = IntervalBuffer()
        if rows is not None:
            for r in rows:
                buf.append(r[0], r[1:4], r[4:7], r[7:19], r[19:31],
                           r[31:35])
        self.buffers[k] = buf
        if defer_preint:
            self.preints[k] = None
        else:
            self.preints[k] = self._run_preint(buf, self.ba[k], self.bg[k],
                                               self.rho[k],
                                               prev=self.preints[k - 1]
                                               if k > 0 else None)

    def _imu_stale(self, buf: IntervalBuffer | None,
                   frac: float = 0.25) -> bool:
        """True if a CONSECUTIVE RUN of bitwise-identical IMU samples (acc
        AND gyr) covers more than `frac` of the interval — the signature of
        a hung driver repeating its last reading; a live IMU's noise floor
        makes exact repeats impossible. The run-length form (vs any-repeats
        fraction) avoids flagging noise-free synthetic replays or heavily
        quantized drivers on a stationary robot, whose repeats are
        scattered, not one frozen block. Gate with cfg.stale_imu_guard=False
        to restore exact reference semantics (the reference integrates the
        hang, estimator.cpp:554-653); the first fire logs a warning."""
        if not getattr(self.cfg, "stale_imu_guard", True):
            return False
        if buf is None or len(buf) < 4:
            return False
        acc = np.asarray(buf.acc)
        gyr = np.asarray(buf.gyr)
        rep = np.all(acc[1:] == acc[:-1], axis=1) \
            & np.all(gyr[1:] == gyr[:-1], axis=1)
        # longest run of consecutive repeats
        best = cur = 0
        for r in rep:
            cur = cur + 1 if r else 0
            best = max(best, cur)
        stale = best >= max(4, frac * len(buf))
        if stale and not self.stats.get("stale_imu_intervals"):
            import logging
            logging.getLogger("cerberus_tpu").warning(
                "stale IMU interval detected (%d identical consecutive "
                "samples of %d): dropping inertial factor, riding vision",
                best + 1, len(buf))
        return stale

    def _pad_buffer(self, buf: IntervalBuffer):
        """Pad a raw interval buffer into fixed-size numpy arrays.

        Returns dict(dt, acc, gyr, phi, dphi, c, mask) with leading dim S
        (a size bucket), or None if the buffer holds < 2 samples. The
        preintegration scan is SEQUENTIAL, so its padded length sits
        directly on the streaming latency path. A normal 15 Hz interval
        holds ~34 samples (bucket 48); only the MARGIN_SECOND_NEW splice
        (~67) needs the full capacity. jit specializes per bucket, so this
        costs one extra compile, not a recompile per length."""
        n = len(buf)
        if n < 2:
            return None
        n = min(n, self.S)
        S = next((b for b in (48, self.S) if n <= b and b <= self.S), self.S)
        dt = np.zeros(S)
        arr = {k: np.zeros((S,) + np.asarray(getattr(buf, k)[0]).shape)
               for k in ("acc", "gyr", "phi", "dphi", "c")}
        ts = np.asarray(buf.t[:n])
        dt[1:n] = np.diff(ts)
        for key in arr:
            vals = getattr(buf, key)[:n]
            arr[key][:n] = np.stack(vals)
            arr[key][n:] = arr[key][n - 1]
        mask = np.zeros(S, bool)
        mask[1:n] = True
        return dict(dt=dt, mask=mask, **arr)

    def _run_preint(self, buf: IntervalBuffer, ba, bg, rho, prev=None):
        """prev: the previous interval's ILPreint — its final adaptive
        foot-force tracker state seeds this interval (contact model 2; see
        ILPreint.ff_* docstring). None = cold start."""
        raw = self._pad_buffer(buf)
        if raw is None:
            return None
        self.stats["dispatches"] = self.stats.get("dispatches", 0) + 1
        ff_init = (None if prev is None else
                   (prev.ff_min, prev.ff_max, prev.ff_window, prev.ff_idx))
        return self._preint(
            jnp.asarray(raw["dt"]), jnp.asarray(raw["acc"]),
            jnp.asarray(raw["gyr"]), jnp.asarray(raw["phi"]),
            jnp.asarray(raw["dphi"]), jnp.asarray(raw["c"]),
            jnp.asarray(raw["mask"]),
            jnp.asarray(ba), jnp.asarray(bg), jnp.asarray(rho),
            ff_init=ff_init)

    def _propagate_frame(self, k: int):
        """Initialize frame k+1 by midpoint dead-reckoning through interval
        k's RAW samples, on the host (reference: processIMULeg forward
        propagation, estimator.cpp:639-646 — the reference also integrates
        raw samples rather than reading back the preintegration deltas).

        Host numpy on ~34 samples is microseconds; the previous version
        device_get the preint deltas, a BLOCKING round-trip (~25 ms through
        a relayed TPU) serializing every frame behind the preintegration
        dispatch. The result only seeds the LM solve, so bit-agreement with
        the device preintegration is not required."""
        buf = self.buffers[k]
        if buf is None or len(buf) < 2:
            return
        i, j = k, k + 1
        g = np.array([0, 0, self.cfg.g_norm])
        ba, bg = self.ba[i], self.bg[i]
        q = self.q[i].copy()
        p = self.p[i].copy()
        v = self.v[i].copy()
        acc_p, gyr_p = buf.acc[0], buf.gyr[0]
        for n in range(1, len(buf)):
            dt = buf.t[n] - buf.t[n - 1]
            acc_c, gyr_c = buf.acc[n], buf.gyr[n]
            un_acc_0 = _rot_np(q, acc_p - ba) - g
            un_gyr = 0.5 * (gyr_p + gyr_c) - bg
            q = _quat_mul_np(q, _delta_q_np(un_gyr * dt))
            un_acc_1 = _rot_np(q, acc_c - ba) - g
            un_acc = 0.5 * (un_acc_0 + un_acc_1)
            p = p + dt * v + 0.5 * dt * dt * un_acc
            v = v + dt * un_acc
            acc_p, gyr_p = acc_c, gyr_c
        self.q[j] = q / np.linalg.norm(q)
        self.p[j] = p
        self.v[j] = v
        self.ba[j] = self.ba[i]
        self.bg[j] = self.bg[i]
        self.rho[j] = self.rho[i]

    # ------------------------------------------------------------------
    def _poses_np(self):
        ric = np.stack([_quat_to_rot_np(self.qic[i]) for i in range(2)])
        R_w = np.stack([_quat_to_rot_np(self.q[i]) for i in range(NF)])
        return ric, self.tic, self.p.copy(), R_w

    def _window_state(self, depths) -> fac.WindowState:
        d = np.ones(self.F)
        d[: len(depths)] = depths
        # jnp.array (copy=True), NOT jnp.asarray: on the CPU backend asarray
        # zero-copy ALIASES the numpy buffers, and the async-dispatched device
        # computations reading this state (solve, marginalization) race with
        # the in-place slide of self.p/q/v/... in _slide_old — nondeterministic
        # run-to-run divergence (a marginalization reading a half-slid window
        # produces a garbage prior).
        a = lambda x: jnp.array(x, self.dtype)
        return fac.WindowState(
            p=a(self.p), q=a(self.q), v=a(self.v),
            ba=a(self.ba), bg=a(self.bg),
            rho=a(self.rho), tic=a(self.tic),
            qic=a(self.qic), td=jnp.array(self.td, self.dtype),
            depth=a(d))

    def _free_mask(self, init=False):
        if init:
            # initialization solve: poses/velocities/IMU biases only — the
            # reference's init frees just the gyro bias (solveGyroscopeBias,
            # estimator.cpp:750; solveGyroLegBias is commented out) and its
            # first optimization() runs with the robot still stationary, so
            # rho/extrinsics/td are effectively fixed there. Freeing them on
            # a 0.7 s window is ill-conditioned and bakes garbage into the
            # first marginalization prior.
            return default_free_mask(optimize_leg_bias=False,
                                     optimize_extrinsic=False,
                                     optimize_td=False,
                                     use_imu=self.cfg.use_imu)
        opt_ex = bool(self.cfg.estimate_extrinsic
                      and (np.linalg.norm(self.v[0]) > 0.2
                           or self.open_ex_estimation))
        if opt_ex:
            self.open_ex_estimation = True
        return default_free_mask(
            optimize_leg_bias=self.cfg.optimize_leg_bias and self.cfg.use_leg_odom,
            optimize_extrinsic=opt_ex,
            optimize_td=bool(self.cfg.estimate_td
                             and np.linalg.norm(self.v[0]) > 0.2),
            use_imu=self.cfg.use_imu)

    def _pack(self, init=False):
        feats, slots = self.fm.export()
        cw = np.zeros(13)
        if self.cfg.ex_prior_sigma_t > 0:
            cw[[0, 1, 2, 6, 7, 8]] = 1.0 / self.cfg.ex_prior_sigma_t
        if self.cfg.ex_prior_sigma_r > 0:
            cw[[3, 4, 5, 9, 10, 11]] = 1.0 / self.cfg.ex_prior_sigma_r
        if self.cfg.td_prior_sigma > 0:
            cw[12] = 1.0 / self.cfg.td_prior_sigma
        ric_ref, tic_ref = self.cfg.ric_tic(n=2)  # static 2-cam packing even
        qic_ref = np.stack([_rot_to_quat_np(ric_ref[i]) for i in range(2)])  # in mono mode
        preints = self.preints if self.cfg.use_imu else [None] * 10
        data = pack_window_data(
            preints, feats, prior=self.prior,
            free_mask=self._free_mask(init),
            gravity=(0, 0, self.cfg.g_norm), F=self.F, dtype=self.dtype,
            calib_prior=(tic_ref, qic_ref, self.td, cw),  # td damper: see _calib
            use_leg_odom=self.cfg.use_leg_odom)
        depths = self.fm.depth_vector(slots)
        return data, feats, slots, depths

    def _optimize(self, init=False):
        data, feats, slots, depths = self._pack(init)
        st0 = self._window_state(depths)
        solve = self._solve_init if init else self._solve
        st, info = solve(st0, data)
        st = jax.device_get(st)
        self._adopt(st, slots, feats)
        self.last_info = info
        self.last_data = data
        return st, info

    def _adopt(self, st, slots, feats):
        self.p = np.array(st.p)
        self.q = np.array(st.q)
        self.v = np.array(st.v)
        self.ba = np.array(st.ba)
        self.bg = np.array(st.bg)
        self.rho = np.array(st.rho)
        self.tic = np.array(st.tic)
        self.qic = np.array(st.qic)
        self.td = float(st.td)
        valid = feats["valid"]
        d = np.asarray(st.depth)[: len(slots)]
        for n, s in enumerate(slots):
            if valid[n]:
                self.fm.depth[s] = d[n]

    def _initialize(self):
        """Stereo+IMU+leg init at frame 10: one full solve with biases free
        replaces solveGyroscopeBias + repropagate (estimator.cpp:734-770),
        then all intervals are re-preintegrated at the solved biases."""
        self._optimize(init=True)
        for k in range(10):
            if self.buffers[k] is not None:
                self.preints[k] = self._run_preint(
                    self.buffers[k], self.ba[k], self.bg[k], self.rho[k],
                    prev=self.preints[k - 1] if k > 0 else None)
        self._optimize(init=True)

    def _predict_next_frame(self):
        """Constant-velocity prediction of tracked features in the next
        image (reference: predictPtsInNextFrame, estimator.cpp:1694-1727):
        nextT = curT * (prevT^-1 * curT)^steps; features with depth observed
        in the newest frame are projected into the predicted left camera.
        Result {feature_id: pts_cam (3,)} is stored on self.predicted_pts
        and passed to self.predict_callback (the replay loop forwards it to
        tracker.set_prediction, reference feature_tracker.cpp:501-518).

        self.predict_steps (default 1) extrapolates further. A PIPELINED
        front-end consumes this prediction one frame later than a serial
        one (frame k's solve seeds the track of frame k+2, not k+1); a
        2-step extrapolation was tried to compensate and measured HARMFUL
        on the device tracker (0.86 % vs 0.27 % drift on the 120 s street
        A/B — gait oscillation defeats constant-velocity extrapolation and
        the device LK has no retry-without-seed fallback) and neutral on
        the cv tracker (evals/diag_tracker_r5.json), so 1 stays the
        default everywhere."""
        self.predicted_pts = {}
        i, j = C.WINDOW_SIZE - 1, C.WINDOW_SIZE
        R_prev, R_cur = _quat_to_rot_np(self.q[i]), _quat_to_rot_np(self.q[j])
        p_prev, p_cur = self.p[i], self.p[j]
        R_d = R_prev.T @ R_cur
        p_d = R_prev.T @ (p_cur - p_prev)
        R_dn, p_dn = R_d, p_d
        for _ in range(int(getattr(self, "predict_steps", 1)) - 1):
            R_dn, p_dn = R_dn @ R_d, R_dn @ p_d + p_dn
        R_next = R_cur @ R_dn
        p_next = p_cur + R_cur @ p_dn
        ric = _quat_to_rot_np(self.qic[0])
        fm = self.fm
        for s in np.nonzero(fm.active & (fm.depth > 0) & fm.obs[:, j])[0]:
            sf = int(fm.start[s])
            pc = fm.pts[s, sf] / fm.depth[s]
            pw = _quat_to_rot_np(self.q[sf]) @ (ric @ pc + self.tic[0]) \
                + self.p[sf]
            pl = R_next.T @ (pw - p_next)
            pcam = ric.T @ (pl - self.tic[0])
            if pcam[2] > 0.1:
                self.predicted_pts[int(fm.ids[s])] = pcam
        if self.predict_callback is not None and self.predicted_pts:
            self.predict_callback(self.predicted_pts)

    def change_sensor_type(self, use_imu: bool, use_stereo: bool):
        """Runtime sensor hot-swap (reference: changeSensorType,
        estimator.cpp:175-212): re-enabling the IMU restarts the system
        (preintegration history is unusable), disabling it drops the
        marginalization prior (its IMU rows linearize a state that no longer
        evolves by dead-reckoning); stereo toggles take effect immediately.

        At least one of (imu, stereo) must stay on — with neither there is
        no scale information (reference prints the same complaint)."""
        if not use_imu and not use_stereo:
            raise ValueError("at least two sensors required: imu or stereo")
        self.flush()   # hot-swap must see the adopted window state
        restart = False
        if use_imu != self.cfg.use_imu:
            self.cfg = self.cfg.replace(use_imu=use_imu)
            if use_imu:
                restart = True
            else:
                self.prior = None
        if use_stereo != self.cfg.stereo:
            self.cfg = self.cfg.replace(
                stereo=use_stereo, num_of_cam=2 if use_stereo else 1)
        if restart:
            self.stats["reboots"] += 1
            self.clear_state()

    def failure_detection(self) -> bool:
        """Divergence checks. The reference defines these thresholds but
        disables them with an early return (estimator.cpp:1005-1050); here
        they are live (SURVEY.md §5 calls for implementing them)."""
        i = C.WINDOW_SIZE

        def fail(reason):
            self.stats.setdefault("failure_reasons", []).append(
                (float(self.headers[i]), reason))
            if getattr(self, "debug", False):
                print(f"[failure_detection] {reason}")
            return True

        if self.cfg.use_imu and np.linalg.norm(self.ba[i]) > 2.5:
            return fail(f"big acc bias {self.ba[i]}")
        if self.cfg.use_imu and np.linalg.norm(self.bg[i]) > 1.0:
            return fail(f"big gyr bias {self.bg[i]}")
        if self._last_pose is not None:
            last_p, last_q = self._last_pose
            if np.linalg.norm(self.p[i] - last_p) > 5.0:
                return fail(f"position jump {self.p[i]} vs {last_p}")
            if abs(self.p[i][2] - last_p[2]) > 1.0:
                return fail(f"z jump {self.p[i][2]} vs {last_p[2]}")
            dq = _quat_mul_np(np.array([last_q[0], -last_q[1], -last_q[2],
                                        -last_q[3]]), self.q[i])
            ang = np.degrees(2 * np.arccos(np.clip(abs(dq[0]), -1, 1)))
            if ang > 50.0:
                return fail(f"rotation jump {ang:.1f} deg")
        self._last_pose = (self.p[i].copy(), self.q[i].copy())
        return False

    def _reject_outliers(self):
        """reference: outliersRejection + removeOutlier (estimator.cpp:805-817)."""
        data, feats, slots, depths = self._pack()
        st = self._window_state(depths)
        errs = np.asarray(self._reproj_err(st, data))[: len(slots)]
        bad = [s for n, s in enumerate(slots)
               if feats["valid"][n] and errs[n] * C.FOCAL_LENGTH > 3.0]
        self.fm.remove_outliers(bad)

    # ------------------------------------------------------------------
    def _post_solve(self, margin_flag, data=None, slots=None):
        """Marginalize + slide, eager path (reference: estimator.cpp:
        1243-1678). Used by the INITIAL phase; the NON_LINEAR streaming path
        fuses the marginalization into _streaming_kernel and only calls
        _emit_keyframe_and_slide."""
        if data is None:
            data, feats, slots, depths = self._pack()
        else:
            depths = self.fm.depth_vector(slots)
        st = self._window_state(depths)
        if margin_flag == MARGIN_OLD:
            pj, pr, valid = self._marg_old(st, data)
            lin = _shift_state(st)
            if getattr(self, "debug", False):
                born = float(0.5 * jnp.sum(pr ** 2))
                if hasattr(self, "last_debug"):
                    self.last_debug["born_prior"] = born
                print(f"[marg_old] born prior cost {born:.1f} valid={bool(valid)}")
            if not self.cfg.marg_td_info:
                # drop td coupling from the prior (see config.marg_td_info)
                pj = pj.at[:, fac.TD_OFF].set(0.0)
            # device-resident prior with the validity flag folded in:
            # bool(valid) here would block the host on the whole
            # marginalization program every frame (~150 ms through a
            # relayed TPU). Invalid ("unstable tracking",
            # marginalization_factor.cpp:205-210) DROPS the prior — the
            # reference also swaps in the invalid info and skips the
            # factor (estimator.cpp:1107) — zeroing keeps that exact
            # semantic without a sync.
            pj = jnp.where(valid, pj, 0.0)
            pr = jnp.where(valid, pr, 0.0)
            self.prior = (pj, pr, lin, valid)
        elif self.prior is not None:
            pj, pr, valid = self._marg_new(st, data)
            lin = _shift_state_second_new(st)
            if getattr(self, "debug", False):
                born = float(0.5 * jnp.sum(pr ** 2))
                print(f"[marg_new] born prior cost {born:.1f} "
                      f"valid={bool(valid)}")
            if not self.cfg.marg_td_info:
                pj = pj.at[:, fac.TD_OFF].set(0.0)
            pj = jnp.where(valid, pj, 0.0)   # see MARGIN_OLD branch
            pr = jnp.where(valid, pr, 0.0)
            self.prior = (pj, pr, lin, valid)
        self._emit_keyframe_and_slide(margin_flag)

    def _emit_keyframe_and_slide(self, margin_flag, pre8m=None):
        """Host half of the post-solve: keyframe export for the loop
        back-end, then the window slide.

        pre8m: spliced interval-8+9 preint already computed inside the
        streaming kernel (device-resident); None = eager path,
        _slide_new re-preintegrates on host dispatch."""
        if margin_flag == MARGIN_OLD:
            if self.keyframe_callback is not None:
                # emit the frame leaving the window: final refined pose, its
                # observed feature ids, and per-feature (normalized obs,
                # world point) for the loop-closure back-end (reference:
                # pubKeyframe publishes exactly pose + 2D obs + 3D points to
                # the external loop_fusion, visualization.cpp:345-398)
                fm = self.fm
                R0 = _quat_to_rot_np(self.q[0])
                ric0 = _quat_to_rot_np(self.qic[0])
                ids, obs = [], {}
                for s in np.nonzero(fm.active & fm.obs[:, 0])[0]:
                    fid = int(fm.ids[s])
                    ids.append(fid)
                    world = None
                    if fm.depth[s] > 0 and fm.start[s] == 0:
                        pc = fm.pts[s, 0] / fm.depth[s]
                        world = R0 @ (ric0 @ pc + self.tic[0]) + self.p[0]
                    obs[fid] = (fm.pts[s, 0, :2].copy(), world)
                self.keyframe_callback(self.headers[0], self.p[0].copy(),
                                       self.q[0].copy(), ids, obs)
            self._slide_old()
        else:
            self._slide_new(pre8m=pre8m)

    def _slide_old(self):
        p0_old = self.p[0].copy()
        R0_old = _quat_to_rot_np(self.q[0])
        for arr in (self.p, self.q, self.v, self.ba, self.bg, self.rho,
                    self.headers):
            arr[:-1] = arr[1:]
        p0_new = self.p[0].copy()
        R0_new = _quat_to_rot_np(self.q[0])
        ric = np.stack([_quat_to_rot_np(self.qic[i]) for i in range(2)])
        self.fm.slide_old(p0_old, R0_old, p0_new, R0_new, self.tic, ric)
        self.buffers = self.buffers[1:] + [None]
        self.preints = self.preints[1:] + [None]

    def _slide_new(self, pre8m=None):
        """Merge interval 8 and 9 (splice frame-10 samples into frame 9;
        reference: estimator.cpp:1567-1652).

        pre8m: merged preint already computed in the streaming kernel (at
        the same solved frame-8 linearization) — adopt it instead of
        dispatching a re-preintegration."""
        b8, b9 = self.buffers[8], self.buffers[9]
        if b8 is not None and b9 is not None and len(b8) and len(b9):
            if pre8m is not None:
                merged = self._merged_buffer  # built at the kernel call
            else:
                merged = IntervalBuffer()
                for i in range(len(b8)):
                    merged.append(b8.t[i], b8.acc[i], b8.gyr[i], b8.phi[i],
                                  b8.dphi[i], b8.c[i])
                for i in range(1, len(b9)):  # skip shared boundary sample
                    merged.append(b9.t[i], b9.acc[i], b9.gyr[i], b9.phi[i],
                                  b9.dphi[i], b9.c[i])
            self.buffers[8] = merged
            if pre8m is not None:
                self.preints[8] = pre8m
            elif self._imu_stale(merged):
                self.preints[8] = None  # hung-IMU samples: drop the factor
            else:
                self.preints[8] = self._run_preint(
                    merged, self.ba[8], self.bg[8], self.rho[8],
                    prev=self.preints[7])
        elif b9 is not None:
            self.buffers[8] = b9
            self.preints[8] = self.preints[9]
        self.buffers[9] = None
        self.preints[9] = None
        # frame 10 -> 9
        for arr in (self.p, self.q, self.v, self.ba, self.bg, self.rho,
                    self.headers):
            arr[C.WINDOW_SIZE - 1] = arr[C.WINDOW_SIZE]
        self.fm.slide_new()

    def _update_latest(self, t):
        i = min(self.frame_count, NF - 1)
        if self._last_raw is not None:
            acc, gyr = self._last_raw
        elif self.buffers[9] is not None and len(self.buffers[9]):
            acc, gyr = self.buffers[9].acc[-1], self.buffers[9].gyr[-1]
        else:
            acc, gyr = np.zeros(3), np.zeros(3)
        self.latest = dict(t=t, p=self.p[i].copy(), q=self.q[i].copy(),
                           v=self.v[i].copy(), ba=self.ba[i].copy(),
                           bg=self.bg[i].copy(), acc=acc, gyr=gyr)

    # ------------------------------------------------------------------
    def _rebase_world(self):
        """Reboot pose continuity: before clear_state wipes the window,
        fold the last published pose into a persistent world offset so the
        re-initialized estimator (gravity-aligned, zero yaw, at origin —
        initFirstIMUPose semantics) continues the trajectory instead of
        teleporting to the origin. The reference's clearState restart
        (estimator.cpp:823-831) loses the world frame; for an odometry
        product the output must stay continuous across recoveries. Both the
        old and new frames are gravity-aligned, so the offset composes a
        yaw-only rotation with a translation.

        Anchors at the last pose that PASSED failure detection (the pose
        that tripped it is by definition corrupted)."""
        if getattr(self, "_last_pose", None) is not None:
            p_raw, q_raw = self._last_pose
        else:
            i = min(self.frame_count, NF - 1)
            p_raw, q_raw = self.p[i], self.q[i]
        off = getattr(self, "_world_offset", None)
        if off is None:
            p_pub = np.asarray(p_raw, float)
            q_pub = np.asarray(q_raw, float)
        else:
            p_off0, R_off0, q_off0 = off
            p_pub = R_off0 @ p_raw + p_off0
            q_pub = _quat_mul_np(q_off0, q_raw)
        yaw = np.arctan2(
            2 * (q_pub[0] * q_pub[3] + q_pub[1] * q_pub[2]),
            1 - 2 * (q_pub[2] ** 2 + q_pub[3] ** 2))
        c, s = np.cos(yaw), np.sin(yaw)
        R_off = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        q_off = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
        self._world_offset = (np.asarray(p_pub, float), R_off, q_off)

    @property
    def pose(self):
        i = min(self.frame_count, NF - 1)
        off = getattr(self, "_world_offset", None)
        if off is None:
            return self.p[i].copy(), self.q[i].copy()
        p_off, R_off, q_off = off
        return (R_off @ self.p[i] + p_off,
                _quat_mul_np(q_off, self.q[i]))

    @property
    def velocity(self):
        v = self.v[min(self.frame_count, NF - 1)].copy()
        off = getattr(self, "_world_offset", None)
        return v if off is None else off[1] @ v


def _cost_breakdown(st: fac.WindowState, data: fac.WindowData, F: int):
    """Debug helper: (ileg, proj, prior) half-sum-of-squares at `st`."""
    zero = jnp.zeros((fac.tangent_dim(F),), st.p.dtype)
    r = np.asarray(fac.window_residuals(st, zero, data))
    s = 310 + F * 44
    return (float(0.5 * (r[:310] ** 2).sum()),
            float(0.5 * (r[310:s] ** 2).sum()),
            float(0.5 * (r[s:] ** 2).sum()))


def _shift_state(st: fac.WindowState) -> fac.WindowState:
    sh = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
    return st._replace(p=sh(st.p), q=sh(st.q), v=sh(st.v), ba=sh(st.ba),
                       bg=sh(st.bg), rho=sh(st.rho))


def _shift_state_second_new(st: fac.WindowState) -> fac.WindowState:
    i, j = C.WINDOW_SIZE - 1, C.WINDOW_SIZE
    rep = lambda a: a.at[i].set(a[j])
    return st._replace(p=rep(st.p), q=rep(st.q), v=rep(st.v), ba=rep(st.ba),
                       bg=rep(st.bg), rho=rep(st.rho))


# ---- small numpy quaternion helpers (host-side only) ----

def _quat_mul_np(q, p):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = p
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _delta_q_np(theta):
    q = np.concatenate([[1.0], theta / 2.0])
    return q / np.linalg.norm(q)


def _quat_to_rot_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _rot_np(q, v):
    return _quat_to_rot_np(q) @ v


def _rot_angle_np(R):
    """Rotation angle (rad) of a rotation matrix."""
    return float(np.arccos(np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)))


def _rot_to_quat_np(R):
    from scipy.spatial.transform import Rotation
    return np.roll(Rotation.from_matrix(R).as_quat(), 1)

"""Packing measurement streams into a WindowData problem.

Bridges the host-side sliding-window bookkeeping (feature slots, interval
buffers) and the device-side fixed-shape problem (ops/factors.WindowData).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cerberus_tpu import config as C
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops.preintegration import ILPreint


def whiten_chol(P: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Cholesky factor L of P (+jitter I); whitening is solve(L, r)."""
    n = P.shape[-1]
    Ps = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    if jitter:
        Ps = Ps + jitter * jnp.eye(n, dtype=P.dtype)
    return jnp.linalg.cholesky(Ps)


_ZERO_PRE: dict = {}


def _zero_pre(dtype) -> ILPreint:
    """Placeholder ILPreint for invalid intervals (identity dq, identity P
    so the cholesky stays defined)."""
    key = jnp.dtype(dtype).name
    if key not in _ZERO_PRE:
        z = lambda *s: jnp.zeros(s, dtype)
        _ZERO_PRE[key] = ILPreint(
            dp=z(3), dq=jnp.asarray([1.0, 0, 0, 0], dtype), dv=z(3),
            deps=z(4, 3), sum_deps=z(3), J=z(31, 31),
            P=jnp.eye(31, dtype=dtype), sum_dt=z(), ba=z(3), bg=z(3),
            rho=z(4), contact_flag=z(4),
            integration_contact=jnp.zeros((4,), bool),
            ff_min=z(4), ff_max=z(4),
            ff_window=z(4, C.FOOT_VAR_WINDOW_SIZE),
            ff_idx=jnp.zeros((4,), jnp.int32))
    return _ZERO_PRE[key]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("use_leg_odom", "cov_jitter"))
def _stack_preints(pres, valid, *, use_leg_odom: bool, cov_jitter: float):
    """Stack 10 ILPreints into the WindowData preint fields in ONE jitted
    program. The eager per-field jnp.stack version dispatched ~110 small ops
    per frame (~40 ms/frame of host time on the streaming path)."""
    s = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    pre_P = jnp.where(valid[:, None, None], s.P,
                      jnp.eye(31, dtype=s.P.dtype)[None])
    if not use_leg_odom:
        # vision+IMU-only mode: decouple the leg rows (eps 9:21, rho 27:31)
        # and inflate their variance — the reference's own all-feet-airborne
        # mechanism (imu_leg_integration_base.cpp:353-358); it swaps
        # IMULegFactor for the 15-dim IMUFactor (estimator.cpp:1122-1171).
        leg = np.zeros(31, bool)
        leg[9:21] = True
        leg[27:31] = True
        keep = jnp.asarray(~leg, s.P.dtype)
        pre_P = pre_P * keep[None, :, None] * keep[None, None, :] \
            + jnp.diag(jnp.asarray(leg, s.P.dtype) * 1e10)[None]
    pre_L = whiten_chol(pre_P, jitter=cov_jitter)
    bad = jnp.any(jnp.isnan(pre_L), axis=(1, 2))
    pre_L = jnp.where(bad[:, None, None],
                      jnp.eye(31, dtype=pre_L.dtype)[None], pre_L)
    # sum_dt > 10 s excluded (reference: estimator.cpp:1119)
    valid = valid & (s.sum_dt < 10.0)
    return (s.dp, s.dq, s.dv, s.deps, s.J, pre_L, s.sum_dt, s.ba, s.bg,
            s.rho, valid)


def default_free_mask(optimize_leg_bias=True, optimize_extrinsic=False,
                      optimize_td=False, use_imu=True) -> np.ndarray:
    """(222,) bool free mask (reference: estimator.cpp:1065-1105
    SetParameterBlockConstant logic). Without IMU, speed/bias states have no
    constraining factor and stay frozen (reference only adds speedbias
    blocks when USE_IMU, estimator.cpp:1071-1076)."""
    m = np.zeros((fac.D_DENSE,), bool)
    m[fac.POSE_OFF: fac.POSE_OFF + 6 * C.NUM_FRAMES] = True
    m[fac.SB_OFF: fac.SB_OFF + 9 * C.NUM_FRAMES] = use_imu
    m[fac.RHO_OFF: fac.RHO_OFF + 4 * C.NUM_FRAMES] = optimize_leg_bias
    m[fac.EX0_OFF: fac.EX0_OFF + 12] = optimize_extrinsic
    m[fac.TD_OFF] = optimize_td
    return m


def pad_features(features: dict, F: int) -> dict:
    """Host-side: pad the feature-manager export to the fixed capacity F.
    Returns a dict of numpy arrays (a valid jit argument pytree)."""
    Fa = features["start"].shape[0]
    assert Fa <= F, f"too many features {Fa} > {F}"

    def padf(x, fill=0.0):
        x = np.asarray(x)
        out = np.full((F,) + x.shape[1:], fill, dtype=x.dtype)
        out[:Fa] = x
        return out

    return dict(
        start=padf(features["start"]).astype(np.int32),
        pts=padf(features["pts"]), pts_r=padf(features["pts_r"]),
        vel=padf(features["vel"]), vel_r=padf(features["vel_r"]),
        td=padf(features["td"]),
        obs=padf(features["obs"]).astype(bool),
        stereo=padf(features["stereo"]).astype(bool),
        valid=padf(features["valid"]).astype(bool),
    )


def zero_prior(F: int, dtype):
    """Device-zero prior tuple (J, r, lin, valid=False) — the 'no prior yet'
    argument of build_window_data / the fused streaming step."""
    return (jnp.zeros((fac.D_DENSE, fac.D_DENSE), dtype),
            jnp.zeros((fac.D_DENSE,), dtype),
            fac.WindowState.zero(F, dtype),
            jnp.asarray(False))


def build_window_data(preints, interval_valid, feats_pad: dict, prior,
                      free_mask, gravity, calib_prior, *,
                      use_leg_odom: bool, cov_jitter: float,
                      dtype) -> fac.WindowData:
    """TRACEABLE WindowData assembly: everything here is pure jnp so the
    whole pack can live inside the fused per-frame streaming program
    (estimator._streaming_step) — the eager version cost one extra dispatch
    plus a host round-trip per frame through a relayed TPU.

    Args:
      preints: tuple of 10 ILPreint pytrees (zero-placeholder for invalid).
      interval_valid: (10,) bool.
      feats_pad: pad_features() output.
      prior: (J, r, lin_state, valid) — use zero_prior() when absent.
      calib_prior: (tic_ref (2,3), qic_ref (2,4), td_ref, w (13,)) or None.
    """
    f = lambda x: jnp.asarray(x, dtype)

    def _co(x):  # coerce float leaves to the pack dtype, keep bools intact
        x = jnp.asarray(x)
        return x.astype(dtype) if (jnp.issubdtype(x.dtype, jnp.floating)
                                   and x.dtype != dtype) else x

    pres = tuple(jax.tree.map(_co, p) for p in preints)
    (pre_dp, pre_dq, pre_dv, pre_deps, pre_J, pre_L, pre_dt, pre_ba,
     pre_bg, pre_rho, valid) = _stack_preints(
        pres, jnp.asarray(interval_valid), use_leg_odom=use_leg_odom,
        cov_jitter=cov_jitter)

    prior_J, prior_r, prior_lin, prior_valid = prior
    prior_J = f(prior_J)
    prior_r = f(prior_r)
    prior_valid = jnp.asarray(prior_valid, bool)
    prior_lin = jax.tree.map(_co, prior_lin)
    prior_lin = prior_lin._replace(depth=jnp.zeros((fac_F(feats_pad),), dtype))

    if calib_prior is None:
        calib_w = jnp.zeros((13,), dtype)
        calib_tic = jnp.zeros((2, 3), dtype)
        calib_qic = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (2, 1))
        calib_td = jnp.zeros((), dtype)
    else:
        tic_ref, qic_ref, td_ref, w = calib_prior
        calib_w = f(w)
        calib_tic = f(tic_ref)
        calib_qic = f(qic_ref)
        calib_td = jnp.asarray(td_ref, dtype)

    return fac.WindowData(
        pre_dp=pre_dp, pre_dq=pre_dq, pre_dv=pre_dv, pre_deps=pre_deps,
        pre_J=pre_J, pre_L=pre_L, pre_dt=pre_dt, pre_ba=pre_ba,
        pre_bg=pre_bg, pre_rho=pre_rho, interval_valid=valid,
        f_start=jnp.asarray(feats_pad["start"], jnp.int32),
        f_pts=f(feats_pad["pts"]),
        f_pts_r=f(feats_pad["pts_r"]), f_vel=f(feats_pad["vel"]),
        f_vel_r=f(feats_pad["vel_r"]), f_td=f(feats_pad["td"]),
        f_obs=jnp.asarray(feats_pad["obs"], bool),
        f_stereo=jnp.asarray(feats_pad["stereo"], bool),
        f_valid=jnp.asarray(feats_pad["valid"], bool),
        prior_J=prior_J, prior_r=prior_r, prior_valid=prior_valid,
        prior_lin=prior_lin,
        free_mask=jnp.asarray(free_mask), gravity=f(gravity),
        calib_w=calib_w, calib_tic=calib_tic, calib_qic=calib_qic,
        calib_td=calib_td,
    )


def fac_F(feats_pad: dict) -> int:
    return feats_pad["start"].shape[0]


def coerce_preints(preints, dtype):
    """(tuple of 10 ILPreint with zero placeholders, (10,) valid numpy) —
    the host-side half of the old pack_window_data preint handling."""
    zero = _zero_pre(dtype)
    pres = tuple(zero if p is None else p for p in preints)
    valid_np = np.array([p is not None for p in preints])
    return pres, valid_np


def pack_window_data(
    preints: list[ILPreint],
    features: dict,
    prior=None,
    free_mask: np.ndarray | None = None,
    gravity=(0.0, 0.0, 9.805),
    F: int = C.MAX_FEATURES,
    dtype=jnp.float64,
    cov_jitter: float = 1e-14,
    calib_prior=None,
    use_leg_odom: bool = True,
) -> fac.WindowData:
    """Assemble a WindowData eagerly (host padding + device assembly).

    Args:
      preints: list of 10 ILPreint (or None for invalid intervals).
      features: dict with numpy arrays
        start (Fa,), pts (Fa,11,3), pts_r (Fa,11,3), vel (Fa,11,2),
        vel_r (Fa,11,2), td (Fa,11), obs (Fa,11) bool, stereo (Fa,11) bool,
        valid (Fa,) bool  — Fa <= F; padded to F here.
      prior: None or (prior_J (222,222), prior_r (222,), lin_state
        [, valid]) — the optional 4th element is a DEVICE bool carrying
        marginalization validity without a host sync.
      calib_prior: None (disabled) or (tic_ref (2,3), qic_ref (2,4), td_ref,
        w (13,)) — standing weak prior on extrinsics/td (fac.WindowData.calib_*).
    """
    pres, valid_np = coerce_preints(preints, dtype)
    feats_pad = pad_features(features, F)
    if prior is None:
        prior_t = zero_prior(F, dtype)
    else:
        prior_t = (prior[0], prior[1], prior[2],
                   prior[3] if len(prior) > 3 else jnp.asarray(True))
    if free_mask is None:
        free_mask = default_free_mask()
    return build_window_data(
        pres, valid_np, feats_pad, prior_t, free_mask, gravity, calib_prior,
        use_leg_odom=use_leg_odom, cov_jitter=cov_jitter, dtype=dtype)

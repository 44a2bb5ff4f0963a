"""Schur-complement marginalization prior.

Pure-functional equivalent of the reference's MarginalizationInfo pipeline
(reference: src/factor/marginalization_factor.cpp:119-311): evaluate the
factors attached to the dying frame, assemble normal equations H, b, Schur-
drop the marginalized dims with an eigendecomposition pseudo-inverse
(eps = 1e-8), and re-factor the kept information into a linear prior
(J_lin, r_lin) via the eigen square root. The reference parallelizes the H
assembly with 4 pthreads (marginalization_factor.cpp:246-275); here it is one
J^T J matmul on the MXU.

The prior lives on the dense 222-dim window tangent (fac.D_DENSE); dropped
feature depths are Schur-eliminated inside this module and never appear in
the prior. Frame relabeling after the window slide is a column permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cerberus_tpu import config as C
from cerberus_tpu.ops import factors as fac
from cerberus_tpu.utils import lie

_EIG_EPS = 1e-8  # reference: marginalization_factor.cpp:281-305
NF = C.NUM_FRAMES


def _prior_from_Hb(H, b, dtype):
    """(J, r) with J^T J = H, J^T r = b via eigen square root.

    The eigendecomposition runs on the Jacobi-equilibrated matrix
    D^-1/2 H D^-1/2: the window Hessian mixes scales across ~12 orders of
    magnitude (whitened rho random-walk blocks ~1e12 vs near-null gauge
    modes), so eigh's RELATIVE roundoff (~1e-16 * lam_max) would otherwise
    produce spurious eigenvalues far above the reference's absolute 1e-8
    cutoff — and the S^-1/2 in `r` amplifies gradient noise along them into
    a diverging prior. After equilibration lam_max ~ n and the absolute
    cutoff is safely above the noise floor."""
    dg = jnp.diag(H)
    d = jnp.sqrt(jnp.maximum(dg, 1e-12))
    Hs = H / (d[:, None] * d[None, :])
    Hs = 0.5 * (Hs + Hs.T)
    lam, V = jnp.linalg.eigh(Hs)
    good = lam > _EIG_EPS
    s = jnp.where(good, jnp.sqrt(jnp.maximum(lam, _EIG_EPS)), 0.0)
    s_inv = jnp.where(good, 1.0 / jnp.maximum(s, _EIG_EPS), 0.0)
    J = (s[:, None] * V.T) * d[None, :]
    r = s_inv[:, None] * V.T @ (b / d)
    return J.astype(dtype), r.astype(dtype)


def _schur_drop(H, b, drop_mask):
    """Schur-complement out the dims where drop_mask is True.

    Returns (H_keep, b_keep) with dropped rows/cols zeroed. Uses an eigh
    pseudo-inverse of the dropped block (reference semantics, eps 1e-8),
    equilibrated for the same scale-spread reason as _prior_from_Hb."""
    m = drop_mask.astype(H.dtype)
    keep = 1.0 - m
    # A = [H_dd, 0; 0, I] in a mask-partitioned sense
    A = H * m[:, None] * m[None, :] + jnp.diag(keep)
    dg = jnp.diag(A)
    d = jnp.sqrt(jnp.maximum(dg, 1e-12))
    As = A / (d[:, None] * d[None, :])
    As = 0.5 * (As + As.T)
    lam, V = jnp.linalg.eigh(As)
    lam_inv = jnp.where(lam > _EIG_EPS, 1.0 / jnp.maximum(lam, _EIG_EPS), 0.0)
    A_inv = (V * lam_inv[None, :]) @ V.T
    A_inv = A_inv / (d[:, None] * d[None, :])
    A_inv = A_inv * m[:, None] * m[None, :]      # restrict to dropped block
    Hd = H * m[None, :]                          # columns into dropped dims
    H_new = H - Hd @ A_inv @ Hd.T
    b_new = b - Hd @ (A_inv @ b)
    H_new = H_new * keep[:, None] * keep[None, :]
    b_new = b_new * keep
    return H_new, b_new


def frame_indices(i):
    """Global tangent indices of frame i (segment-major layout)."""
    return jnp.asarray(fac.frame_tangent_indices(i))


def _gauge_null_basis(state: fac.WindowState, dim: int):
    """(dim, 4) basis of the window's gauge freedoms at `state`: global
    translation (3) and rotation about gravity/yaw (1), on the dense tangent
    (+ zero rows for any appended depth dims — inverse depths are
    anchor-relative and gauge-invariant).

    Every factor in the marginalized system is relative (IMU/leg deltas,
    reprojections, and — inductively — the previous prior), so the exact
    information along these directions is zero; numerically the eigenvalues
    come out at roundoff scale (~1e-4 relative for H ~ 1e6) which passes the
    reference's absolute 1e-8 cutoff and turns the eigen square root
    r = b/sqrt(lam) into a gradient-noise amplifier. Projecting the analytic
    null space out keeps the prior exactly gauge-free, so the solver's
    yaw/position re-anchoring (ops/solver.reanchor) can never fight the
    prior. The reference avoids blow-ups only by fully converging each solve;
    with a fixed iteration budget the projection is required."""
    dtype = state.p.dtype
    N = jnp.zeros((dim, 4), dtype)
    zhat = jnp.asarray([0.0, 0.0, 1.0], dtype)
    for i in range(NF):
        po = fac.POSE_OFF + 6 * i
        so = fac.SB_OFF + 9 * i
        # translations: dp_i = e_d
        for d in range(3):
            N = N.at[po + d, d].set(1.0)
        # yaw: dp_i = z x p_i, dtheta_i = R_i^T z (right-perturbation),
        # dv_i = z x v_i
        N = N.at[po: po + 3, 3].set(jnp.cross(zhat, state.p[i]))
        Ri_T_z = lie.quat_rotate(lie.quat_conj(state.q[i]), zhat)
        N = N.at[po + 3: po + 6, 3].set(Ri_T_z)
        N = N.at[so: so + 3, 3].set(jnp.cross(zhat, state.v[i]))
    return N


def _project_out_gauge(H, b, state: fac.WindowState, keep_mask=None):
    """Project the 4 gauge directions out of (H, b): H <- P H P, b <- P b
    with P = I - N (N^T N)^-1 N^T. `keep_mask` (dim,) restricts the basis to
    the kept dims (rows of dropped dims are zeroed so the projector lives in
    the prior's actual tangent subspace)."""
    dim = H.shape[0]
    N = _gauge_null_basis(state, dim)
    if keep_mask is not None:
        N = N * keep_mask.astype(H.dtype)[:, None]
    G = N.T @ N + 1e-12 * jnp.eye(4, dtype=H.dtype)
    P = jnp.eye(dim, dtype=H.dtype) - N @ jnp.linalg.solve(G, N.T)
    return P @ H @ P, P @ b


def _qr_marginalize(J, r, drop_idx, keep_idx, reg: float = 1e-4):
    """Square-root marginalization: column-permute the weighted Jacobian to
    [dropped | kept], QR-factorize [J_perm | r], and return the kept-block
    triangular factor (R22, r2) — the EXACT linear prior after minimizing
    over the dropped dims.

    Unlike the reference's eigh pipeline (H = J^T J, Schur with a 1e-8
    pseudo-inverse cutoff, eigen square root — marginalization_factor.cpp:
    281-305), the QR form never squares the condition number and never mixes
    an inconsistent (H, b) pair: the carried residual r2 is bounded by |r| by
    construction. The reference's H spans ~12 orders of magnitude (whitened
    rho random-walk ~1e12 vs gauge modes ~0) and its absolute eigenvalue
    cutoff sits inside eigh's roundoff band there, which made the eigh prior
    blow up nondeterministically. `reg` adds sqrt-Tikhonov rows on the
    dropped dims so rank-deficient dropped directions are marginalized as
    weakly-pinned instead of leaking into the kept block (PAPERS.md:
    square-root sliding-window estimation).

    Returns (R22 (K, K), r2 (K,)) in keep_idx column order."""
    dtype = J.dtype
    D = len(drop_idx)
    perm = jnp.concatenate([jnp.asarray(drop_idx, jnp.int32),
                            jnp.asarray(keep_idx, jnp.int32)])
    Jp = J[:, perm]
    # sqrt-Tikhonov on dropped dims only
    regrows = jnp.zeros((D, Jp.shape[1]), dtype)
    regrows = regrows.at[:, :D].set(jnp.eye(D, dtype=dtype) * (reg ** 0.5))
    A = jnp.concatenate([
        jnp.concatenate([Jp, r[:, None]], axis=1),
        jnp.concatenate([regrows, jnp.zeros((D, 1), dtype)], axis=1),
    ], axis=0)
    R = jnp.linalg.qr(A, mode="r")
    n = Jp.shape[1]
    R22 = R[D:n, D:n]
    r2 = R[D:n, n]
    # qr's R rows carry arbitrary signs; (R22, r2) is consistent as a pair
    return R22, r2


def marginalize_old(state: fac.WindowState, data: fac.WindowData):
    """MARGIN_OLD: absorb frame 0 into a new prior
    (reference: estimator.cpp:1248-1376).

    Includes: the existing prior, the IMU+leg factor 0->1, and every
    projection factor anchored at frame 0 (whose depths are dropped too).
    Returns (prior_J, prior_r, prior_valid) on the dense tangent, already
    SHIFTED to the post-slide frame labeling (old frame i -> i-1).

    Matmul precision pinned to 'highest' (see solve_window): the prior is
    the long-horizon memory — bf16-pass noise here accumulates over every
    slide."""
    with jax.default_matmul_precision("highest"):
        return _marginalize_old_impl(state, data)


def _marginalize_old_impl(state: fac.WindowState, data: fac.WindowData):
    F = state.depth.shape[0]
    dtype = state.p.dtype

    # restrict data to the factors the reference marginalizes. The standing
    # calibration prior (data.calib_w) is deliberately EXCLUDED: absorbing it
    # into the marginalization prior every slide would accumulate its
    # information linearly in time and pin the extrinsics/td to config.
    anchored0 = data.f_start == 0
    sub = data._replace(
        interval_valid=data.interval_valid & (jnp.arange(10) == 0),
        f_valid=data.f_valid & anchored0,
        calib_w=jnp.zeros_like(data.calib_w),
    )
    # factor-sparse row assembly (equality-tested vs fac.linearize): the
    # full-width jacfwd alternative costs ~150 ms per marginalization and
    # serializes behind every streaming solve
    from cerberus_tpu.ops.structured import linearize_rows
    r, J = linearize_rows(state, sub)
    # zero the depth columns of non-marginalized features (masked out of the
    # sub-problem anyway) so every depth column can live in the drop group
    dmask = (anchored0 & data.f_valid).astype(dtype)
    J = J.at[:, fac.D_DENSE:].multiply(dmask[None, :])

    import numpy as _np
    drop_idx = _np.concatenate([fac.frame_tangent_indices(0),
                                _np.arange(fac.D_DENSE,
                                           fac.D_DENSE + F)])
    keep_idx = _np.setdiff1d(_np.arange(fac.D_DENSE),
                             fac.frame_tangent_indices(0))
    R22, r2 = _qr_marginalize(J, r, drop_idx, keep_idx)

    # embed the kept block back into the dense (222, 222) layout
    prior_J = jnp.zeros((fac.D_DENSE, fac.D_DENSE), dtype)
    prior_J = prior_J.at[_np.ix_(_np.arange(len(keep_idx)), keep_idx)].set(R22)
    prior_r = jnp.zeros((fac.D_DENSE,), dtype)
    prior_r = prior_r.at[: len(keep_idx)].set(r2)

    # exact gauge freedom: zero the prior's columns along global
    # translation + yaw so the solver's re-anchoring never fights the prior
    keep_mask = jnp.zeros((fac.D_DENSE,), bool).at[jnp.asarray(keep_idx)].set(True)
    N = _gauge_null_basis(state, fac.D_DENSE)
    N = N * keep_mask.astype(dtype)[:, None]
    G = N.T @ N + 1e-12 * jnp.eye(4, dtype=dtype)
    P = jnp.eye(fac.D_DENSE, dtype=dtype) - N @ jnp.linalg.solve(G, N.T)
    prior_J = prior_J @ P

    # shift frame labels: old frame i -> new frame i-1 (column permutation)
    perm = shift_permutation()
    prior_J = prior_J @ perm.astype(dtype)
    valid = jnp.asarray(True)
    return prior_J, prior_r, valid


def marginalize_second_new(state: fac.WindowState, data: fac.WindowData):
    """MARGIN_SECOND_NEW: drop frame (W-1)'s pose from the existing prior only
    (reference: estimator.cpp:1377-1455). Returns shifted (J, r, valid).

    The prior residual is re-evaluated at the CURRENT state (the reference
    re-evaluates all blocks at para_* after the solve) so the resulting
    (J, r) pair is anchored at `state` as its new linearization point."""
    with jax.default_matmul_precision("highest"):
        return _marginalize_second_new_impl(state, data)


def _marginalize_second_new_impl(state: fac.WindowState, data: fac.WindowData):
    dtype = data.prior_J.dtype
    r_here = data.prior_r + data.prior_J @ fac.local_diff(state, data.prior_lin)

    import numpy as _np
    i = C.WINDOW_SIZE - 1
    drop_idx = _np.arange(fac.POSE_OFF + 6 * i, fac.POSE_OFF + 6 * i + 6)
    keep_idx = _np.setdiff1d(_np.arange(fac.D_DENSE), drop_idx)
    R22, r2 = _qr_marginalize(data.prior_J, r_here, drop_idx, keep_idx)

    prior_J = jnp.zeros((fac.D_DENSE, fac.D_DENSE), dtype)
    prior_J = prior_J.at[_np.ix_(_np.arange(len(keep_idx)), keep_idx)].set(R22)
    prior_r = jnp.zeros((fac.D_DENSE,), dtype)
    prior_r = prior_r.at[: len(keep_idx)].set(r2)

    keep_mask = jnp.zeros((fac.D_DENSE,), bool).at[jnp.asarray(keep_idx)].set(True)
    N = _gauge_null_basis(state, fac.D_DENSE)
    N = N * keep_mask.astype(dtype)[:, None]
    G = N.T @ N + 1e-12 * jnp.eye(4, dtype=dtype)
    P = jnp.eye(fac.D_DENSE, dtype=dtype) - N @ jnp.linalg.solve(G, N.T)
    prior_J = prior_J @ P

    perm = shift_second_new_permutation()
    prior_J = prior_J @ perm.astype(dtype)
    # the prior only needs updating if it touched the dropped pose
    touched = jnp.any(jnp.abs(data.prior_J[:, fac.POSE_OFF + 6 * i:
                                           fac.POSE_OFF + 6 * i + 6]) > 0)
    return prior_J, prior_r, data.prior_valid & touched


def _frame_relabel_permutation(mapping):
    """(222, 222) P with (J P) applying old-frame -> new-frame relabeling.

    mapping: dict old_frame -> new_frame; unmapped old frames vanish.
    Ex/td columns map identically."""
    import numpy as np

    P = np.zeros((fac.D_DENSE, fac.D_DENSE))
    for old, new in mapping.items():
        P[np.ix_(fac.frame_tangent_indices(old),
                 fac.frame_tangent_indices(new))] = np.eye(fac.PER_FRAME)
    P[fac.EX0_OFF:, fac.EX0_OFF:] = np.eye(13)
    return jnp.asarray(P)


def shift_permutation():
    """Relabel old frame i -> new i-1 (MARGIN_OLD slide); frame-0 columns
    vanish (just marginalized); the new frame 10 has no prior columns."""
    return _frame_relabel_permutation(
        {i: i - 1 for i in range(1, C.NUM_FRAMES)})


def shift_second_new_permutation():
    """Frame 10 -> 9, frames 0..8 identity, frame 9 vanishes."""
    m = {i: i for i in range(C.WINDOW_SIZE - 1)}
    m[C.WINDOW_SIZE] = C.WINDOW_SIZE - 1
    return _frame_relabel_permutation(m)

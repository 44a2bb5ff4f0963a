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

_EIG_EPS = 1e-8  # reference: marginalization_factor.cpp:281-305


def _prior_from_Hb(H, b, dtype):
    """(J, r) with J^T J = H, J^T r = b via eigen square root."""
    lam, V = jnp.linalg.eigh(H)
    good = lam > _EIG_EPS
    s = jnp.where(good, jnp.sqrt(jnp.maximum(lam, _EIG_EPS)), 0.0)
    s_inv = jnp.where(good, 1.0 / jnp.maximum(s, _EIG_EPS), 0.0)
    J = s[:, None] * V.T
    r = s_inv[:, None] * V.T @ b
    return J.astype(dtype), r.astype(dtype)


def _schur_drop(H, b, drop_mask):
    """Schur-complement out the dims where drop_mask is True.

    Returns (H_keep, b_keep) with dropped rows/cols zeroed. Uses an eigh
    pseudo-inverse of the dropped block (reference semantics, eps 1e-8)."""
    m = drop_mask.astype(H.dtype)
    keep = 1.0 - m
    # A = [H_dd, 0; 0, I] in a mask-partitioned sense
    A = H * m[:, None] * m[None, :] + jnp.diag(keep)
    lam, V = jnp.linalg.eigh(A)
    lam_inv = jnp.where(lam > _EIG_EPS, 1.0 / jnp.maximum(lam, _EIG_EPS), 0.0)
    A_inv = (V * lam_inv[None, :]) @ V.T
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


def marginalize_old(state: fac.WindowState, data: fac.WindowData):
    """MARGIN_OLD: absorb frame 0 into a new prior
    (reference: estimator.cpp:1248-1376).

    Includes: the existing prior, the IMU+leg factor 0->1, and every
    projection factor anchored at frame 0 (whose depths are dropped too).
    Returns (prior_J, prior_r, prior_valid) on the dense tangent, already
    SHIFTED to the post-slide frame labeling (old frame i -> i-1)."""
    F = state.depth.shape[0]
    dtype = state.p.dtype

    # restrict data to the factors the reference marginalizes
    anchored0 = data.f_start == 0
    sub = data._replace(
        interval_valid=data.interval_valid & (jnp.arange(10) == 0),
        f_valid=data.f_valid & anchored0,
    )
    r, J, _ = fac.linearize(state, sub)
    H = J.T @ J
    b = J.T @ r

    drop = jnp.zeros((fac.tangent_dim(F),), bool)
    drop = drop.at[frame_indices(0)].set(True)
    drop = drop.at[fac.D_DENSE:].set(anchored0 & data.f_valid)
    H2, b2 = _schur_drop(H, b, drop)

    Hk = H2[: fac.D_DENSE, : fac.D_DENSE]
    bk = b2[: fac.D_DENSE]
    prior_J, prior_r = _prior_from_Hb(Hk, bk, dtype)

    # shift frame labels: old frame i -> new frame i-1 (column permutation)
    perm = shift_permutation()
    prior_J = prior_J @ perm.astype(dtype)
    # something must have been marginalized for the prior to be valid
    valid = jnp.sum(drop.astype(jnp.int32)) > 0
    return prior_J, prior_r, valid


def marginalize_second_new(state: fac.WindowState, data: fac.WindowData):
    """MARGIN_SECOND_NEW: drop frame (W-1)'s pose from the existing prior only
    (reference: estimator.cpp:1377-1455). Returns shifted (J, r, valid).

    The prior residual is re-evaluated at the CURRENT state (the reference
    re-evaluates all blocks at para_* after the solve) so the resulting
    (J, r) pair is anchored at `state` as its new linearization point."""
    dtype = data.prior_J.dtype
    r_here = data.prior_r + data.prior_J @ fac.local_diff(state, data.prior_lin)
    H = data.prior_J.T @ data.prior_J
    b = data.prior_J.T @ r_here

    i = C.WINDOW_SIZE - 1
    drop = jnp.zeros((fac.D_DENSE,), bool)
    drop = drop.at[fac.POSE_OFF + 6 * i: fac.POSE_OFF + 6 * i + 6].set(True)
    H2, b2 = _schur_drop(H, b, drop)
    prior_J, prior_r = _prior_from_Hb(H2, b2, dtype)

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

"""Pallas TPU kernels for the solver's hot linear algebra.

`cholesky_solve`: batched damped SPD solve (H + lam*diag) x = -b done as ONE
fused kernel per batch element: in-place blocked right-looking Cholesky with
128-wide panels (diagonal panels factored with an unrolled column loop on the
VPU, trailing updates as MXU matmuls), followed by forward/backward
triangular solves — all without leaving VMEM. XLA's TPU cholesky lowers to a
sequential scalar loop over columns with HBM round-trips between the factor
and the two triangular solves; fusing the three stages in VMEM is the win.

Matrices are padded to a multiple of 128 (lane width). For n = 384 (the
window system) one problem occupies 384*384*4 B = 590 KB of VMEM.

STATUS: benchmarked, NOT the default — XLA wins this op and the numbers say
so. Measured on v5e (forced-fetch timing, n=222 production system, net of
the ~25 ms relay roundtrip):

  B=128:  XLA chol+cho_solve ~7.7 ms   | this kernel ~60 ms
  B=1:    XLA ~0.1 ms                  | this kernel ~0.6 ms
  f32 accuracy vs f64: XLA ~1e-3 rel   | this kernel ~8e-3 rel
    (one-hot column recurrences accumulate worse than XLA's blocked factor)

The per-batch-element grid serializes on the single TensorCore, while XLA's
batched Cholesky vectorizes each column step across the whole batch — a
structural loss for this kernel shape at any batch size, not a tuning gap.
(Compile time is NOT the blocker anymore: ~0.8 s.) Kept as a working,
tested example of a fused multi-stage Pallas kernel (factor + two
triangular solves without leaving VMEM); the solver's production path is
jnp.linalg.cholesky + cho_solve. The Pallas-shaped hot spot in this
framework turned out to be the KLT patch gathers — solved with an
MXU-native separable formulation instead (ops/klt.py::_sample_patches,
33x; gathers were the TPU sin, and the fix didn't need a custom kernel).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _chol_solve_kernel(H_ref, b_ref, lam_ref, x_ref, L_ref, y_ref, *,
                       n_pad: int, nblk: int):
    """One batch element: factor L L^T = H_damped, solve L y = -b, L^T x = y.

    All intermediate values are kept >= 2-D ((1, n) rows / (n, 1) cols /
    (1, 1) scalars): Mosaic does not lower 1-D reductions or dots.
    """
    lam = lam_ref[0, 0, 0]
    H = H_ref[0]
    # damping: H + lam * diag(H) (+ tiny floor to keep padding PSD);
    # identity from iota (constants cannot be captured by the kernel)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    eye = (rows == cols).astype(H.dtype)
    diag = jnp.sum(H * eye, axis=1, keepdims=True)   # (n, 1)
    H = H + eye * (lam * diag + 1e-12)
    L_ref[...] = H

    # blocked right-looking Cholesky on the VMEM scratch
    for kb in range(nblk):
        k0 = kb * BLK
        Akk = L_ref[k0:k0 + BLK, k0:k0 + BLK]
        Lkk = _tile_cholesky(Akk)
        L_ref[k0:k0 + BLK, k0:k0 + BLK] = Lkk
        if kb + 1 < nblk:
            rest = slice(k0 + BLK, n_pad)
            Arest = L_ref[rest, k0:k0 + BLK]
            Lrest = _trsm_right_lower_t(Arest, Lkk)
            L_ref[rest, k0:k0 + BLK] = Lrest
            upd = jnp.dot(Lrest, Lrest.T, preferred_element_type=jnp.float32)
            L_ref[rest, rest] = L_ref[rest, rest] - upd.astype(H.dtype)

    # forward solve L y = -b (blocked); y lives as a (1, n) row in y_ref
    y_ref[...] = -b_ref[0]
    for kb in range(nblk):
        k0 = kb * BLK
        Lkk = L_ref[k0:k0 + BLK, k0:k0 + BLK]
        yk = _trsv_lower(Lkk, y_ref[0:1, k0:k0 + BLK])      # (1, BLK)
        y_ref[0:1, k0:k0 + BLK] = yk
        if kb + 1 < nblk:
            rest = slice(k0 + BLK, n_pad)
            upd = jnp.dot(L_ref[rest, k0:k0 + BLK], yk.T,
                          preferred_element_type=jnp.float32).astype(yk.dtype)
            y_ref[0:1, rest] = y_ref[0:1, rest] - upd.T

    # backward solve L^T x = y (blocked, reverse); y_ref is the live buffer
    for kb in reversed(range(nblk)):
        k0 = kb * BLK
        Lkk = L_ref[k0:k0 + BLK, k0:k0 + BLK]
        xk = _trsv_upper(Lkk.T, y_ref[0:1, k0:k0 + BLK])    # (1, BLK)
        x_ref[0, 0:1, k0:k0 + BLK] = xk
        if kb > 0:
            head = slice(0, k0)
            upd = jnp.dot(xk, L_ref[k0:k0 + BLK, head],
                          preferred_element_type=jnp.float32).astype(xk.dtype)
            y_ref[0:1, head] = y_ref[0:1, head] - upd


# Mosaic (Pallas TPU) does not lower dynamic_slice of register values, so all
# row/column selection inside the recurrences uses one-hot contractions
# (vector ops on the VPU) instead of traced indexing.


def _iota_row(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _tile_cholesky(A):
    """Unblocked Cholesky of a BLK x BLK SPD tile (column recurrence)."""
    n = A.shape[0]
    idx = _iota_row(n)                               # (1, n)

    def col(j, L):
        oh = (idx == j).astype(A.dtype)              # (1, n)
        row_j = jnp.where(idx < j, jnp.dot(oh, L), 0.0)   # (1, n)
        col_a = jnp.dot(A, oh.T)                     # (n, 1)
        a_jj = jnp.dot(oh, col_a)                    # (1, 1)
        d = jnp.sqrt(jnp.maximum(a_jj - jnp.dot(row_j, row_j.T), 1e-20))
        below = (col_a - jnp.dot(L, row_j.T)) / d    # (n, 1)
        colv = jnp.where(idx.T > j, below, 0.0) + oh.T * d
        return L * (1.0 - oh) + colv * oh            # broadcast over columns

    L0 = jnp.zeros_like(A)
    return jax.lax.fori_loop(0, n, col, L0)


def _trsm_right_lower_t(B, L):
    """Solve X L^T = B for X (B: (m, BLK), L lower (BLK, BLK))."""
    n = L.shape[0]
    idx = _iota_row(n)

    def col(j, X):
        oh = (idx == j).astype(L.dtype)
        lj = jnp.where(idx < j, jnp.dot(oh, L), 0.0)      # (1, n)
        l_jj = jnp.dot(jnp.dot(oh, L), oh.T)              # (1, 1)
        xj = (jnp.dot(B, oh.T) - jnp.dot(X, lj.T)) / l_jj  # (m, 1)
        return X * (1.0 - oh) + xj * oh

    return jax.lax.fori_loop(0, n, col, jnp.zeros_like(B))


def _trsv_lower(L, b):
    """Solve L x = b with b, x as (1, n) rows."""
    n = L.shape[0]
    idx = _iota_row(n)

    def row(i, x):
        oh = (idx == i).astype(L.dtype)
        li = jnp.where(idx < i, jnp.dot(oh, L), 0.0)
        lii = jnp.dot(jnp.dot(oh, L), oh.T)
        xi = (jnp.dot(b, oh.T) - jnp.dot(x, li.T)) / lii   # (1, 1)
        return x * (1.0 - oh) + oh * xi

    return jax.lax.fori_loop(0, n, row, jnp.zeros_like(b))


def _trsv_upper(U, b):
    """Solve U x = b (U upper) with b, x as (1, n) rows."""
    n = U.shape[0]
    idx = _iota_row(n)

    def row(k, x):
        i = n - 1 - k
        oh = (idx == i).astype(U.dtype)
        ui = jnp.where(idx > i, jnp.dot(oh, U), 0.0)
        uii = jnp.dot(jnp.dot(oh, U), oh.T)
        xi = (jnp.dot(b, oh.T) - jnp.dot(x, ui.T)) / uii
        return x * (1.0 - oh) + oh * xi

    return jax.lax.fori_loop(0, n, row, jnp.zeros_like(b))


@partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve(H, b, lam, interpret: bool = False):
    """Batched damped SPD solve: x = -(H + lam diag(H))^-1 b.

    H: (B, n, n), b: (B, n), lam: (B,) or scalar. Returns x (B, n)."""
    Bb, n, _ = H.shape
    n_pad = _round_up(n, BLK)
    nblk = n_pad // BLK
    dtype = H.dtype
    if n_pad != n:
        H = jnp.pad(H, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        # keep padding solvable
        eye_pad = jnp.zeros((n_pad,), dtype).at[n:].set(1.0)
        H = H + jnp.eye(n_pad, dtype=dtype) * eye_pad[None, :]
        b = jnp.pad(b, ((0, 0), (0, n_pad - n)))
    b = b.reshape(Bb, 1, n_pad)   # (1, n_pad) trailing block satisfies tiling
    lam = jnp.broadcast_to(jnp.asarray(lam, dtype), (Bb,)).reshape(Bb, 1, 1)

    kernel = partial(_chol_solve_kernel, n_pad=n_pad, nblk=nblk)
    x = pl.pallas_call(
        kernel,
        grid=(Bb,),
        in_specs=[
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bb, 1, n_pad), dtype),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad), dtype),
            pltpu.VMEM((1, n_pad), dtype),
        ],
        interpret=interpret,
    )(H, b, lam)
    return x[:, 0, :n]


def use_pallas_default() -> bool:
    return os.environ.get("CERBERUS_NO_PALLAS", "0") != "1"

"""Lane-batched Cholesky solve: B independent SPD systems with the BATCH on
the 128-lane axis.

ops/pallas_kernels.cholesky_solve (r2) put one batch element per grid cell
and lost to XLA 60 ms vs 7.7 ms — the column recurrence serialized on the
single TensorCore while XLA's batched Cholesky vectorizes each column step
across the batch. This kernel adopts XLA's winning axis assignment but fuses
what XLA cannot: layout is (n, n, LANES) with the batch in lanes, so every
column step is one VPU-wide vector op across LANES problems, and the factor
plus BOTH triangular solves run in a single kernel without leaving VMEM
(XLA's chol + cho_solve are three ops with HBM round-trips between them).

Algorithm: symmetric-preserving right-looking Cholesky. Each column step
writes the scaled column AND its row mirror, keeping the trailing block
symmetric — the upper triangle then holds L^T for free, which makes the
backward substitution a row-slice loop too (no transposes; Mosaic relayouts
are expensive). The rank-1 trailing update is restricted to a static
shrinking slab (Python-level blocks of SLAB columns), bounding traffic to
~sum_s SLAB * m_s^2 * LANES instead of n^2 per column.

The in-loop production numbers this targets (evals/profile_inloop.py,
B=128, n=222 reduced system, v5e): XLA chol+cho_solve 8.6 ms/LM-iteration =
46% of the batched solve. Used by ops/solver when
SolveOptions.lane_chol=True (opt-in, batched-throughput path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 64     # batch elements per grid cell; (n,n,LANES) must fit VMEM
SLAB = 32      # update-extent block (static shrinking slabs)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _kernel(W_ref, b_ref, A_out, x_ref, y_ref, *, n_pad: int):
    """Factor + forward + backward substitution for LANES systems.

    W_ref/A_out: (n_pad, n_pad, LANES) aliased — SPD in, L (lower) and L^T
    (upper mirror) out, factored in place. b_ref: (1, n_pad, LANES).
    x_ref: (1, n_pad, LANES). y_ref: VMEM scratch (1, n_pad, LANES).
    """
    dtype = W_ref.dtype
    nblk = n_pad // SLAB

    # ---- Cholesky, symmetric-preserving right-looking ----
    for s in range(nblk):
        s0 = s * SLAB
        m = n_pad - s0
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
        cols_m = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)

        def col(jj, _, s0=s0, m=m, rows_m=rows_m, cols_m=cols_m):
            j = s0 + jj
            d = jnp.sqrt(W_ref[pl.ds(j, 1), pl.ds(j, 1), :])      # (1,1,L)
            old_col = W_ref[pl.ds(s0, m), pl.ds(j, 1), :]         # (m,1,L)
            old_row = W_ref[pl.ds(j, 1), pl.ds(s0, m), :]         # (1,m,L)
            col_strict = jnp.where(rows_m > jj, old_col / d, 0.0)
            row_strict = jnp.where(cols_m > jj, old_row / d, 0.0)
            # scale only BELOW (column) / RIGHT OF (row) the diagonal; the
            # parts before the diagonal hold finished L / L^T entries from
            # earlier columns and must be preserved
            W_ref[pl.ds(s0, m), pl.ds(j, 1), :] = \
                col_strict + jnp.where(rows_m == jj, d, 0.0) \
                + jnp.where(rows_m < jj, old_col, 0.0)
            W_ref[pl.ds(j, 1), pl.ds(s0, m), :] = \
                row_strict + jnp.where(cols_m == jj, d, 0.0) \
                + jnp.where(cols_m < jj, old_row, 0.0)
            # rank-1 trailing update on the slab-trailing block; the strict
            # masking of column/row makes the product zero outside
            # (rows > jj) x (cols > jj), so no extra (m, m) mask is needed.
            # Chunked over static row-slabs: a whole-block update would
            # materialize (m, m, LANES) temporaries (~13 MB at m=224,
            # LANES=64) and blow the ~16 MB scoped-VMEM stack; chunks bound
            # live temporaries to (SLAB, m, LANES) ~ 1.8 MB.
            for r0 in range(0, m, SLAB):
                blk = W_ref[pl.ds(s0 + r0, SLAB), pl.ds(s0, m), :]
                W_ref[pl.ds(s0 + r0, SLAB), pl.ds(s0, m), :] = \
                    blk - col_strict[r0:r0 + SLAB] * row_strict
            return 0

        jax.lax.fori_loop(0, SLAB, col, 0)

    # ---- forward substitution L y = b ----
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad, 1), 1)
    y_ref[...] = jnp.zeros((1, n_pad, LANES), dtype)

    def fwd(j, _):
        rowj = jnp.where(cols_n < j, W_ref[pl.ds(j, 1), :, :], 0.0)
        s = jnp.sum(rowj * y_ref[...], axis=1, keepdims=True)     # (1,1,L)
        d = W_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        y_ref[0:1, pl.ds(j, 1), :] = \
            (b_ref[0:1, pl.ds(j, 1), :] - s) / d
        return 0

    jax.lax.fori_loop(0, n_pad, fwd, 0)

    # ---- backward substitution L^T x = y (upper mirror = L^T) ----
    x_ref[...] = jnp.zeros((1, n_pad, LANES), dtype)

    def bwd(k, _):
        j = n_pad - 1 - k
        rowj = jnp.where(cols_n > j, W_ref[pl.ds(j, 1), :, :], 0.0)
        s = jnp.sum(rowj * x_ref[...], axis=1, keepdims=True)
        d = W_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        x_ref[0:1, pl.ds(j, 1), :] = \
            (y_ref[0:1, pl.ds(j, 1), :] - s) / d
        return 0

    jax.lax.fori_loop(0, n_pad, bwd, 0)


@partial(jax.jit, static_argnames=("interpret",))
def lane_cholesky_solve(A, b, interpret: bool = False):
    """Solve A x = b for a batch of SPD systems. A: (B, n, n), b: (B, n).

    B must be a multiple of LANES (the solver pads its batch; bench batches
    are powers of two). Returns x (B, n). Padding rows get an identity
    diagonal so the factor stays well-defined."""
    Bb, n, _ = A.shape
    assert Bb % LANES == 0, (Bb, LANES)
    n_pad = _round_up(n, SLAB)
    dtype = A.dtype
    if n_pad != n:
        A = jnp.pad(A, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        pad_eye = jnp.zeros((n_pad,), dtype).at[n:].set(1.0)
        A = A + jnp.eye(n_pad, dtype=dtype) * pad_eye[None, :]
        b = jnp.pad(b, ((0, 0), (0, n_pad - n)))
    # lanes-last layout with the lane groups as a LEADING grid axis:
    # (B, n, n) -> (G, n, n, LANES). Mosaic requires a block's last two dims
    # to be (8, 128)-divisible OR equal to the array dims; a (n, n, LANES)
    # block over a (n, n, B) array fails that when LANES < B, so the group
    # axis moves into the array shape and the BlockSpec squeezes it (None),
    # leaving the kernel's 3-D view unchanged.
    G = Bb // LANES
    At = jnp.transpose(
        jnp.transpose(A, (1, 2, 0)).reshape(n_pad, n_pad, G, LANES),
        (2, 0, 1, 3))
    bt = jnp.transpose(b, (1, 0)).reshape(n_pad, G, LANES)
    bt = jnp.transpose(bt, (1, 0, 2))[:, None]          # (G, 1, n_pad, L)

    grid = (G,)
    kernel = partial(_kernel, n_pad=n_pad)
    A_out, x = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, n_pad, n_pad, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, n_pad, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, n_pad, n_pad, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, n_pad, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, n_pad, n_pad, LANES), dtype),
            jax.ShapeDtypeStruct((G, 1, n_pad, LANES), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((1, n_pad, LANES), dtype)],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(At, bt)
    # (G, 1, n_pad, L) -> (B, n)
    xt = jnp.transpose(x[:, 0], (1, 0, 2)).reshape(n_pad, Bb)
    return jnp.transpose(xt[:n], (1, 0))


def lane_cholesky_solve_ref(A, b):
    """NumPy-convention reference (jnp.linalg): the exact op the kernel
    replaces; used by tests and the bench harness."""
    L = jnp.linalg.cholesky(A)
    return jax.vmap(lambda Lk, bk: jax.scipy.linalg.cho_solve(
        (Lk, True), bk))(L, b)

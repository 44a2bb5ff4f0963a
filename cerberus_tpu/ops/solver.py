"""Batched Levenberg-Marquardt core for the sliding-window problem.

Replaces the reference's Ceres DENSE_SCHUR + DOGLEG solve
(reference: estimator.cpp:1221-1236). On TPU the reduced system is small
enough (~(222+F) dims) that an explicitly-damped dense Cholesky per iteration
beats a Schur pipeline: one fat J^T J matmul on the MXU + one O(n^3) factor.
The whole loop lives inside jit (lax.fori_loop) and vmaps over batches of
windows. Gauge freedom (global position + yaw) is handled like the reference:
free during the solve (damping regularizes the null space) and re-anchored to
frame 0 afterwards (estimator.cpp:903-1000 double2vector).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cerberus_tpu.ops import factors as fac
from cerberus_tpu.utils import lie


class SolveOptions(NamedTuple):
    max_iters: int = 12           # reference: max_num_iterations
    lam0: float = 1e-4
    lam_up: float = 4.0
    lam_down: float = 3.0
    lam_min: float = 1e-8         # floor: with the gauge projected out, the
                                  # remaining near-null dirs (weak depths) must
                                  # not blow up as lam decays over iterations
    lam_max: float = 1e8
    diag_floor: float = 1e-8
    structured: bool = True       # factor-sparse H assembly (ops/structured.py)
                                  # False = dense jacfwd J then J^T J
    function_tolerance: float = 1e-6  # early stop on relative cost decrease
                                      # (Ceres function_tolerance semantics)
    step_clip: float = 1.0        # trust-region-style safety valve: scale the
                                  # whole step if any component exceeds this
                                  # (m / rad / unit inverse-depth). Plays the
                                  # role of Ceres DOGLEG's trust radius for
                                  # near-null directions.
    project_gauge: bool = True    # project the analytic 4-dim gauge null
                                  # space (global translation + yaw) out of
                                  # (H, b) each iteration so roundoff gradient
                                  # along it can never drive a huge step
    schur: bool = True            # eliminate the (diagonal) inverse-depth
                                  # block in closed form before the dense
                                  # Cholesky — algebraically identical to the
                                  # full solve, O((222+F)^3) -> O(222^3)
                                  # (requires structured=True)


class SolveInfo(NamedTuple):
    cost0: jax.Array
    cost: jax.Array
    lam: jax.Array
    accepted: jax.Array   # number of accepted steps


def _damped_solve(H, b, lam, opts: SolveOptions):
    """Solve (H + lam*diag(H)) dx = -b with Jacobi equilibration."""
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), opts.diag_floor))
    Hs = H / (d[:, None] * d[None, :])
    n = H.shape[0]
    A = Hs + lam * jnp.eye(n, dtype=H.dtype) + 1e-12 * jnp.eye(n, dtype=H.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.cho_solve((L, True), -b / d)
    return y / d


def _damped_solve_schur(H_pp, H_pd, h_dd, b_p, b_d, lam, opts: SolveOptions):
    """Schur-on-depth version of _damped_solve: exact closed-form elimination
    of the diagonal inverse-depth block in the SAME Jacobi-equilibrated,
    identically-damped system, then a dense Cholesky of only the 222-dim
    reduced block. Algebraically identical to _damped_solve on the assembled
    full matrix (tests/test_structured.py enforces agreement)."""
    d_p = jnp.sqrt(jnp.maximum(jnp.diag(H_pp), opts.diag_floor))
    d_d = jnp.sqrt(jnp.maximum(h_dd, opts.diag_floor))
    Hs_pp = H_pp / (d_p[:, None] * d_p[None, :])
    Hs_pd = H_pd / (d_p[:, None] * d_d[None, :])
    a_dd = h_dd / (d_d * d_d) + lam + 1e-12          # scaled depth diagonal
    D = H_pp.shape[0]
    A_pp = Hs_pp + (lam + 1e-12) * jnp.eye(D, dtype=H_pp.dtype)

    W = Hs_pd / a_dd[None, :]                        # (D, F)
    S = A_pp - W @ Hs_pd.T
    rhs = -b_p / d_p + W @ (b_d / d_d)
    L = jnp.linalg.cholesky(S)
    y_p = jax.scipy.linalg.cho_solve((L, True), rhs)
    y_d = (-b_d / d_d - Hs_pd.T @ y_p) / a_dd
    return jnp.concatenate([y_p / d_p, y_d / d_d])


def _project_gauge_blocks(H_pp, H_pd, b_p, st, free_mask):
    """Rank-4 form of the gauge projection P (.) P on the block system.
    The gauge basis has support only on pose/speed dims (< D_DENSE), so
    P = blockdiag(P_dense, I_F): depth rows/cols are untouched. Equivalent
    to marginalize._project_out_gauge but O(D^2 * 4) instead of O(D^3)."""
    from cerberus_tpu.ops.marginalize import _gauge_null_basis
    D = H_pp.shape[0]
    N = _gauge_null_basis(st, D)
    N = N * free_mask.astype(H_pp.dtype)[:, None]
    G = N.T @ N + 1e-10 * jnp.eye(4, dtype=H_pp.dtype)
    K = jnp.linalg.solve(G, N.T).T                   # N @ G^-1, (D, 4)
    NH = N.T @ H_pp                                  # (4, D)
    NHN = NH @ N                                     # (4, 4)
    H_pp = (H_pp - K @ NH - NH.T @ K.T
            + K @ NHN @ K.T)
    H_pd = H_pd - K @ (N.T @ H_pd)
    b_p = b_p - K @ (N.T @ b_p)
    return H_pp, H_pd, b_p


def solve_window(state: fac.WindowState, data: fac.WindowData,
                 opts: SolveOptions = SolveOptions()):
    """Run LM on one window. Returns (new_state, SolveInfo).

    Traced under jax.default_matmul_precision('highest'): TPU default f32
    matmuls are bf16 passes whose ~3e-3 relative noise swamps the weakest
    gradient directions (rho calibration, td) in the H/b assembly. No-op on
    CPU; costs MXU passes on TPU but the window solve is small enough that
    latency is dispatch-dominated (see bench.py numbers)."""
    with jax.default_matmul_precision("highest"):
        return _solve_window_impl(state, data, opts)


def _solve_window_impl(state: fac.WindowState, data: fac.WindowData,
                       opts: SolveOptions):
    F = state.depth.shape[0]

    # Linearize-at-candidate LM: each iteration does exactly ONE residual +
    # Jacobian + H/b assembly pass (at the candidate state), and the
    # candidate's robust cost is computed from that assembly's own residual
    # vector — there is no standalone cost pass. The iterate sequence is
    # identical (up to the residual-path roundoff bounded by
    # tests/test_structured.py, ~1e-10 — accept decisions at exact cost
    # ties can differ bitwise) to the classic
    # assemble-at-current/evaluate-candidate loop:
    # on accept the candidate's assembly is exactly what the next iteration
    # would have rebuilt; on reject the retained (H, b) of the current state
    # is exactly what a reassembly at the unchanged state would produce.
    # This removes ~40% of per-iteration device time (the full residual
    # stack was evaluated twice per iteration).
    if opts.structured and opts.schur:
        # block assembly + closed-form depth elimination: the depth-depth
        # Hessian block is diagonal (one inverse depth per projection
        # row), so the dense Cholesky only ever sees the 222-dim state
        # block — Ceres' DENSE_SCHUR ordering, done on the MXU.
        from cerberus_tpu.ops.structured import build_normal_equations_blocks

        def assemble(st):
            H_pp, H_pd, h_dd, b_p, b_d, r0 = \
                build_normal_equations_blocks(st, data)
            if opts.project_gauge:
                H_pp, H_pd, b_p = _project_gauge_blocks(
                    H_pp, H_pd, b_p, st, data.free_mask)
            return (H_pp, H_pd, h_dd, b_p, b_d), fac.robust_cost(r0, F)

        def solve_step(pieces, lam):
            H_pp, H_pd, h_dd, b_p, b_d = pieces
            return _damped_solve_schur(H_pp, H_pd, h_dd, b_p, b_d, lam, opts)
    else:
        def assemble(st):
            if opts.structured:
                from cerberus_tpu.ops.structured import build_normal_equations
                H, b, r0 = build_normal_equations(st, data)
            else:
                r, J, r0 = fac.linearize(st, data)
                H = J.T @ J
                b = J.T @ r
            if opts.project_gauge:
                # every factor is relative, so H is exactly singular along
                # global translation + yaw; numerically those eigenvalues sit
                # at roundoff scale and b picks up roundoff gradient along
                # them — at small lam that turns into an arbitrarily large
                # cost-neutral step (chaotic run-to-run divergence). Remove
                # the subspace analytically (same basis as
                # ops/marginalize._gauge_null_basis).
                from cerberus_tpu.ops.marginalize import _gauge_null_basis
                dim = H.shape[0]
                N = _gauge_null_basis(st, dim)
                freec = jnp.concatenate([
                    data.free_mask, data.f_valid]).astype(H.dtype)
                N = N * freec[:, None]
                # P = I - N (N^T N)^-1 N^T via a 4x4 solve — a tall-skinny QR
                # here costs ~15 ms/iter at B=128 on TPU (bad tiling), while
                # this form is three small matmuls on the MXU
                G = N.T @ N + 1e-10 * jnp.eye(4, dtype=H.dtype)
                P = jnp.eye(dim, dtype=H.dtype) - N @ jnp.linalg.solve(G, N.T)
                H = P @ H @ P
                b = P @ b
            return (H, b), fac.robust_cost(r0, F)

        def solve_step(pieces, lam):
            return _damped_solve(pieces[0], pieces[1], lam, opts)

    pieces0, cost0 = assemble(state)

    def cond(carry):
        st, pieces, lam, cost, acc, it, done = carry
        return (it < opts.max_iters) & jnp.logical_not(done)

    def body(carry):
        st, pieces, lam, cost, acc, it, done = carry
        dx = solve_step(pieces, lam)
        mx = jnp.max(jnp.abs(dx))
        dx = dx * jnp.minimum(1.0, opts.step_clip / jnp.maximum(mx, 1e-30))
        cand = fac.retract(st, dx)
        cand_pieces, new_cost = assemble(cand)
        ok = new_cost < cost
        # converged: an accepted step improved cost by < tol * cost
        done2 = ok & (cost - new_cost <= opts.function_tolerance * cost)
        st2 = jax.tree.map(lambda a, b_: jnp.where(ok, a, b_), cand, st)
        pieces2 = jax.tree.map(lambda a, b_: jnp.where(ok, a, b_),
                               cand_pieces, pieces)
        lam2 = jnp.where(ok, jnp.maximum(lam / opts.lam_down, opts.lam_min),
                         jnp.minimum(lam * opts.lam_up, opts.lam_max))
        cost2 = jnp.where(ok, new_cost, cost)
        return (st2, pieces2, lam2, cost2, acc + ok.astype(jnp.int32),
                it + 1, done2)

    lam = jnp.asarray(opts.lam0, state.p.dtype)
    st, _, lam, cost, acc, it, _ = jax.lax.while_loop(
        cond, body, (state, pieces0, lam, cost0, jnp.zeros((), jnp.int32),
                     jnp.zeros((), jnp.int32), jnp.asarray(False)))
    st = reanchor(state, st)
    return st, SolveInfo(cost0=cost0, cost=cost, lam=lam, accepted=acc)


def solve_window_batched(states: fac.WindowState, datas: fac.WindowData,
                         opts: SolveOptions = SolveOptions(),
                         lane_chol: bool | None = None,
                         gemm_precision: str = "highest"):
    """Batched LM over B windows with the linear solve LANE-BATCHED.

    `jax.vmap(solve_window)` hides the batch from the per-iteration
    Cholesky: XLA factors B independent (D, D) systems with its generic
    batched cholesky + cho_solve, measured 8.6 ms of the 18.7 ms LM
    iteration at B=128 (evals/profile_inloop.py). This variant runs the
    SAME assembly/accept/damping math vmapped, but forms the reduced Schur
    system for the whole batch and solves it with one fused Pallas kernel
    that puts the batch on the 128-lane axis (ops/lane_cholesky) — factor
    and both triangular substitutions in one VMEM-resident program.

    Semantics vs vmap(solve_window): identical update rules; runs a fixed
    `max_iters` iterations with per-window accept/freeze (a vmapped
    while_loop also runs until the last window converges, so the cost
    profile matches); requires opts.structured & opts.schur &
    opts.project_gauge. Iterates agree with the vmapped path to roundoff
    (tests/test_lane_cholesky.py pins it).

    lane_chol: force the Pallas path on/off; None = on when a TPU is
    present (interpret-mode Pallas on CPU is correct but slow, so CPU
    defaults to the XLA solve in the same batched structure).
    gemm_precision: matmul precision for the assembly/solve GEMMs.
    'highest' (default) = 6-pass bf16 emulation of f32 — what the
    streaming solver uses; 'high' = 3 passes, ~2x GEMM throughput at
    ~1e-6 relative noise (throughput-product experiment; check
    convergence costs before trusting results at 'high')."""
    assert opts.structured and opts.schur and opts.project_gauge
    if lane_chol is None:
        lane_chol = jax.devices()[0].platform != "cpu"
    from cerberus_tpu.ops.lane_cholesky import (LANES, lane_cholesky_solve,
                                                lane_cholesky_solve_ref)
    from cerberus_tpu.ops.structured import build_normal_equations_blocks

    B = states.p.shape[0]
    F = datas.f_valid.shape[1]
    dtype = states.p.dtype

    with jax.default_matmul_precision(gemm_precision):
        def assemble_one(st, d):
            H_pp, H_pd, h_dd, b_p, b_d, r0 = \
                build_normal_equations_blocks(st, d)
            H_pp, H_pd, b_p = _project_gauge_blocks(H_pp, H_pd, b_p, st,
                                                    d.free_mask)
            return (H_pp, H_pd, h_dd, b_p, b_d), fac.robust_cost(r0, F)

        assemble = jax.vmap(assemble_one)

        def solve_step(pieces, lam):
            """Batched _damped_solve_schur with the dense solve batched
            across lanes. Same Jacobi equilibration and damping."""
            H_pp, H_pd, h_dd, b_p, b_d = pieces
            D = H_pp.shape[1]
            d_p = jnp.sqrt(jnp.maximum(
                jnp.diagonal(H_pp, axis1=1, axis2=2), opts.diag_floor))
            d_d = jnp.sqrt(jnp.maximum(h_dd, opts.diag_floor))
            Hs_pp = H_pp / (d_p[:, :, None] * d_p[:, None, :])
            Hs_pd = H_pd / (d_p[:, :, None] * d_d[:, None, :])
            a_dd = h_dd / (d_d * d_d) + lam[:, None] + 1e-12
            eye = jnp.eye(D, dtype=dtype)
            A_pp = Hs_pp + (lam[:, None, None] + 1e-12) * eye
            W = Hs_pd / a_dd[:, None, :]
            S = A_pp - jnp.einsum("bdf,bef->bde", W, Hs_pd)
            rhs = -b_p / d_p + jnp.einsum("bdf,bf->bd", W, b_d / d_d)
            if lane_chol and B % LANES == 0:
                y_p = lane_cholesky_solve(S, rhs)
            else:
                y_p = lane_cholesky_solve_ref(S, rhs)
            y_d = (-b_d / d_d
                   - jnp.einsum("bdf,bd->bf", Hs_pd, y_p)) / a_dd
            return jnp.concatenate([y_p / d_p, y_d / d_d], axis=1)

        pieces0, cost0 = assemble(states, datas)

        def body(carry, _):
            st, pieces, lam, cost, done, acc = carry
            dx = solve_step(pieces, lam)
            mx = jnp.max(jnp.abs(dx), axis=1, keepdims=True)
            dx = dx * jnp.minimum(1.0, opts.step_clip
                                  / jnp.maximum(mx, 1e-30))
            cand = jax.vmap(fac.retract)(st, dx)
            cand_pieces, new_cost = assemble(cand, datas)
            ok = (new_cost < cost) & ~done
            pick = lambda a, b_: jnp.where(
                ok.reshape((B,) + (1,) * (a.ndim - 1)), a, b_)
            st2 = jax.tree.map(pick, cand, st)
            pieces2 = jax.tree.map(pick, cand_pieces, pieces)
            done2 = done | (ok & (cost - new_cost
                                  <= opts.function_tolerance * cost))
            lam2 = jnp.where(done, lam, jnp.where(
                ok, jnp.maximum(lam / opts.lam_down, opts.lam_min),
                jnp.minimum(lam * opts.lam_up, opts.lam_max)))
            cost2 = jnp.where(ok, new_cost, cost)
            return (st2, pieces2, lam2, cost2, done2,
                    acc + ok.astype(jnp.int32)), None

        lam0 = jnp.full((B,), opts.lam0, dtype)
        done0 = jnp.zeros((B,), bool)
        acc0 = jnp.zeros((B,), jnp.int32)
        (st, _, lam, cost, _, acc), _ = jax.lax.scan(
            body, (states, pieces0, lam0, cost0, done0, acc0), None,
            length=opts.max_iters)
        st = jax.vmap(reanchor)(states, st)
        return st, SolveInfo(cost0=cost0, cost=cost, lam=lam, accepted=acc)


def reanchor(old: fac.WindowState, new: fac.WindowState) -> fac.WindowState:
    """Re-fix the gauge: keep frame-0 position and yaw at their pre-solve
    values (reference: estimator.cpp:903-1000)."""
    ypr_old = lie.rot_to_ypr(lie.quat_to_rot(old.q[0]))
    ypr_new = lie.rot_to_ypr(lie.quat_to_rot(new.q[0]))
    y_diff = ypr_old[0] - ypr_new[0]
    rot_diff = lie.ypr_to_rot(jnp.stack([y_diff, jnp.zeros_like(y_diff),
                                         jnp.zeros_like(y_diff)]))
    # euler-singularity fallback (pitch near +-90 deg)
    singular = (jnp.abs(jnp.abs(ypr_old[1]) - 90.0) < 1.0) | \
               (jnp.abs(jnp.abs(ypr_new[1]) - 90.0) < 1.0)
    R_fallback = lie.quat_to_rot(old.q[0]) @ lie.quat_to_rot(new.q[0]).T
    rot_diff = jnp.where(singular, R_fallback, rot_diff)
    q_diff = lie.rot_to_quat(rot_diff)

    p = (new.p - new.p[0]) @ rot_diff.T + old.p[0]
    q = lie.quat_normalize(lie.quat_mul(q_diff[None, :], new.q))
    v = new.v @ rot_diff.T
    return new._replace(p=p, q=q, v=v)

"""Batched + distributed window solving.

Two parallelism modes (SURVEY.md §2 'TPU-native equivalents'):

1. `batched_solve` — DATA parallel: vmap the whole LM solve over a batch of
   independent windows, shard the batch axis over the mesh. Zero cross-device
   communication inside the solve; linear scaling is the expectation and the
   benchmark (windows-solved/s at 1 chip -> N chips).

2. `pooled_calibration_step` — cross-window REDUCTION: windows sharded over
   the mesh each contribute normal equations for a SHARED calibration block
   (per-leg calf lengths), psum-reduced over ICI and solved once. The psum
   is the collective replacement of the reference's 4-pthread normal-
   equation assembly (marginalization_factor.cpp:246-275), applied to the
   fleet-calibration capability the reference solves per-window only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cerberus_tpu.ops import factors as fac
from cerberus_tpu.ops.solver import SolveOptions, solve_window


def batched_solve(states, datas, mesh: Mesh | None = None,
                  opts: SolveOptions = SolveOptions(), axis: str = "batch"):
    """Solve a batch of windows; optionally sharded over a mesh.

    states/datas: pytrees with a leading batch axis. Returns (states, infos)
    with the same sharding.
    """
    fn = jax.vmap(lambda s, d: solve_window(s, d, opts))
    if mesh is None:
        return jax.jit(fn)(states, datas)
    sh = NamedSharding(mesh, P(axis))
    jfn = jax.jit(fn, in_shardings=(
        jax.tree.map(lambda _: sh, states), jax.tree.map(lambda _: sh, datas)))
    return jfn(states, datas)


def pooled_calibration_step(states, datas, mesh: Mesh | None = None,
                            axis: str = "batch", damping: float = 1e-6):
    """One Gauss-Newton step on a SHARED per-leg kinematic calibration
    (rho, 4 dims) pooled across a batch of windows sharded over the mesh.

    This is the fleet-calibration capability: one robot, many independent
    data segments — each window's residuals constrain the same physical calf
    lengths, so the shared normal equations are the psum over devices of the
    per-window contributions. The psum is the collective replacement of the
    reference's 4-pthread normal-equation assembly
    (marginalization_factor.cpp:246-275); per-window rho blocks are chained
    into ONE shared block (same delta applied to every frame's rho).

    Returns (new_states with rho shifted by the shared step, dx_rho (4,),
    H (4,4), b (4,)). Call after batched_solve to refine calibration with
    strictly more information than any single window carries.
    """
    from jax.experimental.shard_map import shard_map

    def per_window(state, data):
        r, J, _ = fac.linearize(state, data)
        # chain rule: shared rho delta applies to every frame's rho block
        cols = [J[:, fac.RHO_OFF + 4 * i: fac.RHO_OFF + 4 * (i + 1)]
                for i in range(fac.NF)]
        J_s = sum(cols)                      # (N, 4)
        return J_s.T @ J_s, J_s.T @ r

    def local(states_shard, datas_shard):
        H, b = jax.vmap(per_window)(states_shard, datas_shard)
        H = jnp.sum(H, axis=0)
        b = jnp.sum(b, axis=0)
        if mesh is not None:
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
        return H, b

    if mesh is None:
        H, b = local(states, datas)
    else:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(axis), states),
                      jax.tree.map(lambda _: P(axis), datas)),
            out_specs=(P(), P()))
        H, b = fn(states, datas)
    dtype = H.dtype
    dx = -jnp.linalg.solve(H + damping * jnp.eye(4, dtype=dtype), b)
    new_states = states._replace(rho=states.rho + dx[None, None, :])
    return new_states, dx, H, b

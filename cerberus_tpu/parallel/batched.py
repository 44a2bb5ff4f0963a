"""Batched + distributed window solving.

Two parallelism modes (SURVEY.md §2 'TPU-native equivalents'):

1. `batched_solve` — DATA parallel: vmap the whole LM solve over a batch of
   independent windows, shard the batch axis over the mesh. Zero cross-device
   communication inside the solve; linear scaling is the expectation and the
   benchmark (windows-solved/s at 1 chip -> N chips).

2. `distributed_normal_equations` — MODEL-style parallel for one (or few)
   windows: shard the RESIDUAL rows of the stacked Jacobian across devices,
   form partial J^T J / J^T r locally, and `psum` over the mesh. This is the
   collective replacement of the reference's 4-pthread normal-equation
   assembly (marginalization_factor.cpp:246-275): same math, but the
   reduction rides ICI instead of shared memory.
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


def distributed_normal_equations(state: fac.WindowState, data: fac.WindowData,
                                 mesh: Mesh, axis: str = "batch"):
    """Assemble H = J^T J and b = J^T r for ONE window with the residual rows
    sharded across the mesh devices, reduced with psum.

    Row padding: N is padded up to a multiple of the mesh size; padded rows
    are zero and contribute nothing to the reduction.
    """
    F = state.depth.shape[0]
    n_dev = mesh.shape[axis]
    r, J, _ = fac.linearize(state, data)
    N = r.shape[0]
    pad = (-N) % n_dev
    r = jnp.pad(r, (0, pad))
    J = jnp.pad(J, ((0, pad), (0, 0)))

    def local(r_shard, J_shard):
        H = jax.lax.psum(J_shard.T @ J_shard, axis)
        b = jax.lax.psum(J_shard.T @ r_shard, axis)
        return H, b

    from jax.experimental.shard_map import shard_map

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis, None)),
                   out_specs=(P(), P()))
    return fn(r, J)

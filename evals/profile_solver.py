#!/usr/bin/env python
"""Micro-profile of the batched window solve: which stage dominates?

Times (forced value fetch, median of reps) on the current platform:
  full solve (12 iters) / assembly-only / cholesky-only / cost-only /
  gauge-QR-only, each vmapped over B windows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=6):
    fn(*args)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(fn(*args)))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.window_builder import build_window_from_sim
    from cerberus_tpu.ops import factors as fac
    from cerberus_tpu.ops.solver import SolveOptions, solve_window, _damped_solve
    from cerberus_tpu.ops.structured import build_normal_equations
    from cerberus_tpu.ops.marginalize import _gauge_null_basis

    cfg = EstimatorConfig()
    sim = simulate(SimConfig(duration=10.0, speed=0.5, seed=3))
    data, truth, Fa = build_window_from_sim(sim, cfg, dtype=dtype)
    B = int(os.environ.get("B", "128"))
    states = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                          truth)
    datas = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                         data)
    F = truth.depth.shape[0]
    dim = fac.tangent_dim(F)

    with jax.default_matmul_precision("highest"):
        solve12 = jax.jit(jax.vmap(
            lambda s, d: solve_window(s, d, SolveOptions(max_iters=12))[0].p[0, 0]))
        solve1 = jax.jit(jax.vmap(
            lambda s, d: solve_window(s, d, SolveOptions(max_iters=1))[0].p[0, 0]))
        asm = jax.jit(jax.vmap(
            lambda s, d: build_normal_equations(s, d)[0][0, 0]))
        cost = jax.jit(jax.vmap(lambda s, d: fac.robust_cost(
            fac.window_residuals(s, jnp.zeros(dim, dtype), d), F)))

        def chol_fn(s, d):
            H, b, _ = build_normal_equations(s, d)
            return _damped_solve(H, b, jnp.asarray(1e-4, dtype),
                                 SolveOptions())[0]
        chol = jax.jit(jax.vmap(chol_fn))

        def gauge_fn(s, d):
            N = _gauge_null_basis(s, dim)
            Q, _ = jnp.linalg.qr(N)
            return Q[0, 0]
        gauge = jax.jit(jax.vmap(gauge_fn))

        dense = jax.jit(jax.vmap(
            lambda s, d: solve_window(
                s, d, SolveOptions(max_iters=1, structured=False))[0].p[0, 0]))

    out = {
        "platform": jax.devices()[0].platform, "B": B, "F": F,
        "solve12_ms": round(timed(solve12, states, datas) * 1000, 1),
        "solve1_ms": round(timed(solve1, states, datas) * 1000, 1),
        "assembly_ms": round(timed(asm, states, datas) * 1000, 1),
        "assembly+chol_ms": round(timed(chol, states, datas) * 1000, 1),
        "cost_ms": round(timed(cost, states, datas) * 1000, 1),
        "gaugeQR_ms": round(timed(gauge, states, datas) * 1000, 1),
    }
    try:
        out["dense1_ms"] = round(timed(dense, states, datas) * 1000, 1)
    except Exception as e:  # dense path may OOM at big B
        out["dense1_ms"] = f"failed: {type(e).__name__}"
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()

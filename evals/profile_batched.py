#!/usr/bin/env python
"""Profile the BATCHED window-solve path (bench.py's B=128 product) and
attribute the per-window time: assembly vs Schur/Cholesky vs retract/cost
vs loop overhead. Writes PROFILE_BATCHED.json and (optionally) a
jax.profiler trace directory for xprof.

VERDICT r4 item 5: the 1.75 ms/window at B=128 was never attributed; this
measures each stage of the LM iteration standalone at the same batch size,
with forced value fetches (block_until_ready does not block through the
axon relay) and varied inputs between reps.

Usage: python evals/profile_batched.py [--batch 128] [--trace DIR]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace output dir")
    ap.add_argument("--out", default="PROFILE_BATCHED.json")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    print("platform:", jax.devices()[0].platform, flush=True)

    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.window_builder import build_window_from_sim
    from cerberus_tpu.ops import factors as fac
    from cerberus_tpu.ops.solver import (SolveOptions, _damped_solve_schur,
                                         _project_gauge_blocks, solve_window)
    from cerberus_tpu.ops.structured import build_normal_equations_blocks

    cfg = EstimatorConfig(dtype=str(dtype.__name__))
    sim = simulate(SimConfig(duration=10.0, speed=0.5, seed=3))
    data, truth, _ = build_window_from_sim(sim, cfg, dtype=dtype)
    B = args.batch
    F = int(truth.depth.shape[0])

    def perturb(i):
        r = np.random.default_rng(i)
        return truth._replace(
            p=truth.p + jnp.asarray(r.normal(size=(11, 3)) * 0.03, dtype),
            v=truth.v + jnp.asarray(r.normal(size=(11, 3)) * 0.05, dtype))

    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[perturb(i) for i in range(B)])
    datas = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                         data)
    opts = SolveOptions(max_iters=12)

    def timed(fn, tag, *xs):
        """Median wall of a jitted fn that returns ONE scalar (reduced
        inside the program — per-leaf eager reductions through the relay
        would dominate), over varied inputs, with a forced value fetch."""
        fn(*xs)  # compile+warm
        ts = []
        for i in range(args.reps):
            xs2 = jax.tree.map(
                lambda a: a + jnp.asarray(1e-7 * (i + 1), a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, xs)
            t0 = time.time()
            float(fn(*xs2))
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1000
        print(f"{tag}: {ms:.2f} ms total, {ms/B*1000:.1f} us/window", flush=True)
        return ms

    def scalar_of(out):
        leaves = [l for l in jax.tree.leaves(out)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(jnp.sum(l) for l in leaves)

    with jax.default_matmul_precision("highest"):
        # null roundtrip through the relay (per-dispatch latency floor)
        null = jax.jit(lambda x: jnp.sum(x) + 1.0)
        t_null = timed(lambda x: null(x), "null_roundtrip",
                       jnp.zeros((4,), dtype))

        # full production solve
        solve = jax.jit(jax.vmap(
            lambda s, d: solve_window(s, d, opts)[0].p[0, 0]))
        t_full = timed(lambda s, d: jnp.sum(solve(s, d)), "full_solve_12it",
                       states, datas)

        # stage 1: one assembly (blocks + gauge projection + robust cost)
        def assemble_once(st, d):
            H_pp, H_pd, h_dd, b_p, b_d, r0 = \
                build_normal_equations_blocks(st, d)
            H_pp, H_pd, b_p = _project_gauge_blocks(H_pp, H_pd, b_p, st,
                                                    d.free_mask)
            return H_pp, H_pd, h_dd, b_p, b_d, fac.robust_cost(r0, F)

        asm = jax.jit(jax.vmap(assemble_once))
        asm_s = jax.jit(lambda s, d: scalar_of(asm(s, d)))
        t_asm = timed(asm_s, "assembly_x1", states, datas)

        # stage 2: one damped Schur/Cholesky solve on cached pieces
        pieces = jax.block_until_ready(asm(states, datas))
        lam = jnp.full((B,), 1e-4, dtype)

        def schur_once(H_pp, H_pd, h_dd, b_p, b_d, lam):
            return _damped_solve_schur(H_pp, H_pd, h_dd, b_p, b_d, lam, opts)

        sch = jax.jit(jax.vmap(schur_once))
        sch_s = jax.jit(lambda *p: jnp.sum(sch(*p)))
        t_sch = timed(sch_s, "schur_cholesky_x1",
                      pieces[0], pieces[1], pieces[2], pieces[3], pieces[4],
                      lam)

        # stage 3: retract
        dx = sch(pieces[0], pieces[1], pieces[2], pieces[3], pieces[4], lam)
        ret_s = jax.jit(lambda s, d: scalar_of(jax.vmap(fac.retract)(s, d)))
        t_ret = timed(ret_s, "retract_x1", states, dx)

        # 12-iteration extrapolation vs measured full solve = loop
        # overhead. Each standalone stage pays one relay roundtrip the
        # fused solve pays once — subtract t_null per stage.
        per_iter = (t_asm - t_null) + (t_sch - t_null) + (t_ret - t_null)
        overhead = (t_full - t_null) - 12 * per_iter

    result = dict(
        platform=jax.devices()[0].platform, dtype=str(dtype.__name__),
        batch=B, reps=args.reps,
        null_roundtrip_ms=round(t_null, 2),
        full_solve_ms=round(t_full, 2),
        per_window_us=round(t_full / B * 1000, 1),
        assembly_ms_per_iter=round(t_asm - t_null, 2),
        schur_cholesky_ms_per_iter=round(t_sch - t_null, 2),
        retract_ms_per_iter=round(t_ret - t_null, 2),
        extrapolated_12it_ms=round(12 * per_iter, 2),
        residual_overhead_ms=round(overhead, 2),
        note="stage device-times (null roundtrip subtracted), standalone at "
             "the same B; residual = (full-null) - 12*(asm+schur+retract): "
             "while_loop bookkeeping, cost-compare/select",
    )
    if args.trace:
        import jax.profiler
        with jax.profiler.trace(args.trace):
            for i in range(3):
                sts = states._replace(p=states.p + 1e-7 * i)
                float(jnp.sum(solve(sts, datas)))
        result["trace_dir"] = args.trace
        print("trace written to", args.trace, flush=True)
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

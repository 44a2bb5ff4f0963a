#!/usr/bin/env python
"""In-loop attribution of the batched LM solve: time the REAL 12-iteration
while_loop against variants with one stage stubbed out, all shape-identical
and fused by XLA the same way (standalone stage timings over-attribute —
XLA fuses differently inside the loop).

Variants (function_tolerance forced to 0 => always 12 iterations):
  full        assemble + schur-cholesky + retract each iteration
  no_chol     schur solve replaced by a diagonal-preconditioned step
  asm_once    candidate assembly reused from iteration 0 (loop does
              solve+retract only)
  full-no_chol  = in-loop cholesky cost;  full-asm_once = in-loop assembly.

Also sweeps batch sizes for the full production solve.

Usage: python evals/profile_inloop.py [--batch 128] [--batches 128,512,1024]
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
    ap.add_argument("--batches", default="128,512,1024")
    ap.add_argument("--out", default="PROFILE_BATCHED.json")
    ap.add_argument("--reps", type=int, default=8)
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
    F = int(truth.depth.shape[0])
    opts = SolveOptions(max_iters=12, function_tolerance=0.0)

    def make_batch(B):
        def perturb(i):
            r = np.random.default_rng(i)
            return truth._replace(
                p=truth.p + jnp.asarray(r.normal(size=(11, 3)) * 0.03, dtype),
                v=truth.v + jnp.asarray(r.normal(size=(11, 3)) * 0.05, dtype))
        states = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[perturb(i) for i in range(B)])
        datas = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
        return states, datas

    def timed(fn, tag, B, *xs):
        fn(*xs)
        ts = []
        for i in range(args.reps):
            xs2 = (xs[0]._replace(p=xs[0].p + 1e-7 * (i + 1)),) + xs[1:]
            t0 = time.time()
            float(fn(*xs2))
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1000
        print(f"{tag}: {ms:.2f} ms, {ms/B*1000:.0f} us/window", flush=True)
        return ms

    # --- variant loop (mirrors ops/solver._solve_window_impl structure) ---
    def make_solver(variant):
        def solve_one(state, d):
            def assemble(st):
                H_pp, H_pd, h_dd, b_p, b_d, r0 = \
                    build_normal_equations_blocks(st, d)
                H_pp, H_pd, b_p = _project_gauge_blocks(
                    H_pp, H_pd, b_p, st, d.free_mask)
                return (H_pp, H_pd, h_dd, b_p, b_d), fac.robust_cost(r0, F)

            def solve_step(pieces, lam):
                H_pp, H_pd, h_dd, b_p, b_d = pieces
                if variant == "no_chol":
                    dp = -b_p / jnp.maximum(jnp.diag(H_pp), 1e-8) / (1 + lam)
                    dd = -b_d / jnp.maximum(h_dd, 1e-8) / (1 + lam)
                    return jnp.concatenate([dp, dd])
                return _damped_solve_schur(H_pp, H_pd, h_dd, b_p, b_d,
                                           lam, opts)

            pieces0, cost0 = assemble(state)

            def body(carry, _):
                st, pieces, lam, cost = carry
                dx = solve_step(pieces, lam)
                mx = jnp.max(jnp.abs(dx))
                dx = dx * jnp.minimum(1.0, opts.step_clip
                                      / jnp.maximum(mx, 1e-30))
                cand = fac.retract(st, dx)
                if variant == "asm_once":
                    cand_pieces, new_cost = pieces, cost * 0.999
                else:
                    cand_pieces, new_cost = assemble(cand)
                ok = new_cost < cost
                st2 = jax.tree.map(lambda a, b_: jnp.where(ok, a, b_),
                                   cand, st)
                pieces2 = jax.tree.map(lambda a, b_: jnp.where(ok, a, b_),
                                       cand_pieces, pieces)
                lam2 = jnp.where(ok, lam / 3.0, lam * 4.0)
                cost2 = jnp.where(ok, new_cost, cost)
                return (st2, pieces2, lam2, cost2), None

            lam = jnp.asarray(opts.lam0, dtype)
            (st, *_), _ = jax.lax.scan(
                body, (state, pieces0, lam, cost0), None, length=12)
            return st.p[0, 0]

        def f(states, datas):
            with jax.default_matmul_precision("highest"):
                return jnp.sum(jax.vmap(solve_one)(states, datas))
        return jax.jit(f)

    B = args.batch
    states, datas = make_batch(B)
    t = {}
    for variant in ("full", "no_chol", "asm_once"):
        t[variant] = timed(make_solver(variant), f"variant_{variant}", B,
                           states, datas)
    chol_ms = t["full"] - t["no_chol"]
    asm_ms = (t["full"] - t["asm_once"]) * 12 / 11  # 11 of 12 stubbed
    print(f"in-loop cholesky: {chol_ms:.1f} ms/solve "
          f"({chol_ms/12:.2f} ms/iter); in-loop assembly: {asm_ms:.1f} "
          f"ms/solve ({asm_ms/12:.2f} ms/iter)", flush=True)

    # --- production solve across batch sizes ---
    prod_opts = SolveOptions(max_iters=12)
    rows = []
    for Bi in [int(x) for x in args.batches.split(",")]:
        sts, dts = make_batch(Bi)
        solve = jax.jit(jax.vmap(
            lambda s, d: solve_window(s, d, prod_opts)[0].p[0, 0]))
        ms = timed(lambda s, d: jnp.sum(solve(s, d)), f"prod_B{Bi}", Bi,
                   sts, dts)
        rows.append(dict(batch=Bi, ms=round(ms, 2),
                         windows_per_s=round(Bi / ms * 1000, 1)))

    result = dict(platform=jax.devices()[0].platform,
                  dtype=str(dtype.__name__), batch=B, F=F,
                  variant_full_ms=round(t["full"], 2),
                  variant_no_chol_ms=round(t["no_chol"], 2),
                  variant_asm_once_ms=round(t["asm_once"], 2),
                  inloop_cholesky_ms_per_iter=round(chol_ms / 12, 3),
                  inloop_assembly_ms_per_iter=round(asm_ms / 12, 3),
                  batch_sweep=rows,
                  note="scan-based 12-iter timing skeletons; full-no_chol = "
                       "cholesky+triangular cost in situ, full-asm_once = "
                       "assembly cost in situ (x12/11)")
    print(json.dumps(result))
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing["inloop"] = result
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: batched window solves per second on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The headline number is windows-solved/s for the full VILO sliding-window
problem (11 frames, IMU+leg factors, stereo projection factors, 12 LM
iterations with relinearization each) — the unit of work the reference's
Ceres solver performs once per keyframe in <= 0.1 s on CPU
(reference: config max_solver_time 0.1, estimator.cpp:1226-1233). The
vs_baseline field is therefore windows/s relative to the reference's
real-time budget rate of 10 solves/s.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

# Peak MXU throughput per chip for MFU accounting. The window solve runs
# under default_matmul_precision('highest') (see ops/solver.py), which on
# TPU emulates f32 matmuls with ~6 bf16 MXU passes — so "achievable peak"
# for this workload is bf16_peak / 6. Values: TPU v5e 197 TFLOPS bf16
# (public spec); CPU fallback uses a nominal 100 GFLOP/s just so the field
# is populated.
_PEAK_FLOPS = {"tpu": 197e12 / 6, "cpu": 100e9}


def _flops_of(compiled) -> float:
    """XLA's own flop count for a compiled executable (0.0 if the backend
    does not report cost analysis)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.window_builder import build_window_from_sim
    from cerberus_tpu.ops.solver import SolveOptions, solve_window

    cfg = EstimatorConfig(dtype=str(dtype.__name__))
    sim = simulate(SimConfig(duration=10.0, speed=0.5, seed=3))
    data, truth, Fa = build_window_from_sim(sim, cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    B = int(os.environ.get("BENCH_BATCH", "128" if on_tpu else "2"))

    def perturb(key_seed):
        r = np.random.default_rng(key_seed)
        return truth._replace(
            p=truth.p + jnp.asarray(r.normal(size=(11, 3)) * 0.03, dtype),
            v=truth.v + jnp.asarray(r.normal(size=(11, 3)) * 0.05, dtype),
            ba=jnp.zeros_like(truth.ba), bg=jnp.zeros_like(truth.bg),
        )

    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[perturb(i) for i in range(B)])
    datas = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                         data)

    opts = SolveOptions(max_iters=12)
    # return a scalar so timing includes a forced value fetch: on relayed/async
    # backends block_until_ready alone does NOT guarantee execution finished
    # lane path is opt-in: the fused lane-Cholesky kernel cannot compile
    # inside the LM while_loop on v5e (the aliased operand lands on the
    # 16 MB scoped-VMEM stack) and loses standalone anyway — measured in
    # BENCH_EXPERIMENTS.json. XLA's batched chol/cho_solve is the default.
    lane = os.environ.get("BENCH_LANE_CHOL", "0") == "1"
    if lane:
        # lane-batched Schur/Cholesky path (ops/lane_cholesky): same LM
        # math, the per-iteration dense solve runs as ONE Pallas kernel
        # with the batch on the lane axis (see solver.solve_window_batched)
        from cerberus_tpu.ops.solver import solve_window_batched
        prec = os.environ.get("BENCH_GEMM_PRECISION", "highest")
        solve = jax.jit(
            lambda s, d: solve_window_batched(
                s, d, opts, gemm_precision=prec)[0].p[:, 0, 0])
    else:
        solve = jax.jit(jax.vmap(
            lambda s, d: solve_window(s, d, opts)[0].p[0, 0]))

    import jax.numpy as _jnp

    def run_once(sts, dts):
        return float(_jnp.sum(solve(sts, dts)))

    run_once(states, datas)
    reps = 10
    times = []
    for i in range(reps):
        # vary input slightly so no caching layer can elide the work
        sts = states._replace(p=states.p + 1e-7 * i)
        t0 = time.time()
        run_once(sts, datas)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    wps = B / dt

    # single-window latency (the real-time serving metric; reference budget
    # is 0.1 s/solve, yaml max_solver_time) — always the production
    # streaming solver (solve_window), independent of the batched path
    solve_one = jax.jit(jax.vmap(
        lambda s, d: solve_window(s, d, opts)[0].p[0, 0]))
    one_states = jax.tree.map(lambda x: x[:1], states)
    one_datas = jax.tree.map(lambda x: x[:1], datas)

    def run_one(sts, dts):
        return float(_jnp.sum(solve_one(sts, dts)))

    run_one(one_states, one_datas)
    lat = []
    for i in range(reps):
        sts = one_states._replace(p=one_states.p + 1e-7 * i)
        t0 = time.time()
        run_one(sts, one_datas)
        lat.append(time.time() - t0)
    lat_ms = float(np.median(lat)) * 1000

    # null-program roundtrip: dispatch+fetch of a trivial kernel. Through
    # the axon relay this is ~26 ms and dominates the single-window number;
    # the device-time estimate below is the on-chip latency a local
    # deployment would see (full decomposition: evals/profile_streaming.py
    # -> PROFILE_STREAM.json).
    null = jax.jit(lambda x: x + 1.0)
    nt = []
    z = jnp.zeros((4,), dtype)
    float(jnp.sum(null(z)))
    for i in range(reps):
        t0 = time.time()
        float(jnp.sum(null(z + i)))
        nt.append(time.time() - t0)
    null_ms = float(np.median(nt)) * 1000

    # ---- speed-of-light / MFU accounting (BASELINE.json north star) ----
    # flops model: XLA's own cost analysis of the compiled batched solve.
    platform = jax.devices()[0].platform
    peak = _PEAK_FLOPS.get("cpu" if platform == "cpu" else "tpu", 1e12)
    total_flops = _flops_of(solve.lower(states, datas).compile())
    flops_per_window = total_flops / B if total_flops else 0.0
    achieved = flops_per_window * wps            # flops/s at measured rate
    mfu_pct = 100.0 * achieved / peak if total_flops else 0.0
    # latency- vs compute-bound: per-window time at B=1 vs amortized at B.
    # If batching B windows costs barely more wall time than one, the
    # single-window path is dominated by dispatch/roundtrip latency and
    # kernel-launch serialization, not by MXU math.
    amortized_ms = dt * 1000 / B
    bound = "latency" if lat_ms > 5 * amortized_ms else "compute"

    result = {
        "metric": "windows_solved_per_s",
        "value": round(wps, 3),
        "unit": "windows/s",
        "vs_baseline": round(wps / 10.0, 3),
        "batch": B,
        "platform": platform,
        "dtype": str(dtype.__name__),
        "batch_latency_ms": round(dt * 1000, 2),
        "single_window_latency_ms": round(lat_ms, 3),
        "null_roundtrip_ms": round(null_ms, 2),
        "single_window_device_ms": round(max(lat_ms - null_ms, 0.0), 2),
        "flops_per_window": round(flops_per_window),
        "achieved_gflops": round(achieved / 1e9, 2),
        "peak_gflops_f32_highest": round(peak / 1e9),
        "mfu_pct": round(mfu_pct, 3),
        "bound": bound,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

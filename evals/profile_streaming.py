#!/usr/bin/env python
"""Latency decomposition of the per-frame streaming kernel at B=1.

The 450 s street run blocks ~62 ms/frame: ~28 ms relay roundtrip + ~35 ms
device. This script isolates where the device time goes — the newest-interval
preintegration scan (S sequential 31-dim steps), the structured H/b
assembly, the per-LM-iteration cost (assembly + Schur-Cholesky), and the
marginalization — by timing each sub-program with a forced value fetch and
subtracting the measured null-program roundtrip (VERDICT r3 item 5).

Usage: python evals/profile_streaming.py [--out PROFILE_STREAM.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=8):
    fn(*args)  # compile + warm
    ts = []
    for i in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))  # force a fetch
        ts.append(time.time() - t0)
    return 1000.0 * float(np.median(ts))


def main():
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from cerberus_tpu.config import EstimatorConfig
    from cerberus_tpu.data import SimConfig, simulate
    from cerberus_tpu.data.window_builder import build_window_from_sim
    from cerberus_tpu.ops import factors as fac
    from cerberus_tpu.ops import marginalize as marg
    from cerberus_tpu.ops.preintegration import (
        PreintParams, il_preintegrate)
    from cerberus_tpu.ops.solver import SolveOptions, solve_window
    from cerberus_tpu.ops.structured import build_normal_equations_blocks

    cfg = EstimatorConfig()
    sim = simulate(SimConfig(duration=10.0, speed=0.5, seed=3))
    data, truth, _ = build_window_from_sim(sim, cfg, dtype=dtype)
    st = truth._replace(p=truth.p + 0.02)

    out = {"platform": jax.devices()[0].platform,
           "F": int(st.depth.shape[0])}

    # null roundtrip: dispatch + fetch of a trivial program
    null = jax.jit(lambda x: x + 1.0)
    out["null_roundtrip_ms"] = round(timed(null, jnp.zeros((4,), dtype)), 1)

    # preintegration scan at the streaming bucket S=48
    params = PreintParams.from_config(cfg, dtype)
    S = 48
    rng = np.random.default_rng(0)
    a = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, dtype)
    pre_args = (jnp.full((S,), 0.002, dtype), a(S, 3) + jnp.array([0, 0, 9.8], dtype),
                a(S, 3), a(S, 12), a(S, 12),
                jnp.ones((S, 4), dtype), jnp.ones((S,), bool).at[0].set(False),
                jnp.zeros((3,), dtype), jnp.zeros((3,), dtype),
                jnp.full((4,), 0.21, dtype))
    preint = jax.jit(lambda *x: il_preintegrate(*x, params).P)
    out["preint_scan_S48_ms"] = round(timed(preint, *pre_args), 1)

    # structured assembly (one pass)
    asm = jax.jit(lambda s: build_normal_equations_blocks(s, data)[0])
    with jax.default_matmul_precision("highest"):
        out["assembly_ms"] = round(timed(asm, st), 1)

    # full solve at various iteration budgets -> per-iteration slope
    for it in (1, 2, 4, 8, 12):
        f = jax.jit(lambda s, _it=it: solve_window(
            s, data, SolveOptions(max_iters=_it, function_tolerance=0.0))[0].p)
        out[f"solve_{it}it_ms"] = round(timed(f, st), 1)
    out["per_iter_ms"] = round(
        (out["solve_12it_ms"] - out["solve_4it_ms"]) / 8.0, 2)

    # marginalization
    mo = jax.jit(lambda s: marg.marginalize_old(s, data)[0])
    out["marg_old_ms"] = round(timed(mo, st), 1)

    null_ms = out["null_roundtrip_ms"]
    out["_device_estimates"] = {
        k.replace("_ms", "_dev_ms"): round(max(v - null_ms, 0.0), 1)
        for k, v in out.items()
        if k.endswith("_ms") and k != "null_roundtrip_ms"
        and isinstance(v, (int, float))}

    print(json.dumps(out, indent=1))
    outfile = sys.argv[sys.argv.index("--out") + 1] \
        if "--out" in sys.argv else None
    if outfile:
        with open(outfile, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

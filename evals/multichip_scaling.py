#!/usr/bin/env python
"""Multi-device scaling benchmark: windows-solved/s vs mesh size.

Shards a batch of full production window solves (structured + Schur +
gauge-projected LM, the same options bench.py and the estimator use) over a
1/2/4/8-device mesh and measures throughput. On real hardware the mesh rides
ICI; in CI the mesh is virtual CPU devices
(--xla_force_host_platform_device_count), which validates the SPMD program
end-to-end but shares the host's physical cores — wall-clock scaling there is
bounded by core count, and the report records both.

Each mesh size runs in a SUBPROCESS because the device count must be fixed
before backend init.

Usage: python evals/multichip_scaling.py [--out MULTICHIP_r02.json]
       [--devices 1,2,4,8] [--batch-per-device 16] [--platform cpu]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, time, json
n = int(sys.argv[1]); B = int(sys.argv[2]); platform = sys.argv[3]
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags and platform == "cpu":
    os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={n}").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, %(repo)r)
import jax
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.data import SimConfig, simulate
from cerberus_tpu.data.window_builder import build_window_from_sim
from cerberus_tpu.ops.solver import SolveOptions, solve_window

on_tpu = any(d.platform != "cpu" for d in jax.devices())
dtype = jnp.float32 if on_tpu else jnp.float64
if not on_tpu:
    jax.config.update("jax_enable_x64", True)
cfg = EstimatorConfig(dtype=str(dtype.__name__))
sim = simulate(SimConfig(duration=10.0, speed=0.5, seed=3))
data, truth, _ = build_window_from_sim(sim, cfg, dtype=dtype)
devs = jax.devices()[:n]
assert len(devs) == n, (len(devs), n)
mesh = Mesh(np.array(devs), ("batch",))
rng = np.random.default_rng(0)
def perturb(i):
    r = np.random.default_rng(i)
    return truth._replace(
        p=truth.p + jnp.asarray(r.normal(size=(11, 3)) * 0.03, dtype),
        v=truth.v + jnp.asarray(r.normal(size=(11, 3)) * 0.05, dtype))
states = jax.tree.map(lambda *xs: jnp.stack(xs), *[perturb(i) for i in range(B)])
datas = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), data)
sh = NamedSharding(mesh, P("batch"))
states = jax.tree.map(lambda x: jax.device_put(x, sh), states)
datas = jax.tree.map(lambda x: jax.device_put(x, sh), datas)
opts = SolveOptions(max_iters=12)   # PRODUCTION options
solve = jax.jit(jax.vmap(lambda s, d: solve_window(s, d, opts)[0].p[0, 0]))
def run(sts):
    return float(jnp.sum(solve(sts, datas)))   # force a value fetch
run(states)
times = []
for i in range(5):
    sts = states._replace(p=states.p + 1e-7 * i)
    t0 = time.time(); run(sts); times.append(time.time() - t0)
dt = float(np.median(times))
print(json.dumps({"n": n, "batch": B, "windows_per_s": round(B / dt, 2),
                  "latency_ms": round(dt * 1000, 1),
                  "platform": jax.devices()[0].platform}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTICHIP_r02.json")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--batch-per-device", type=int, default=16)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    worker = _WORKER % {"repo": REPO}
    sizes = [int(x) for x in args.devices.split(",")]
    rows = []
    for n in sizes:
        B = n * args.batch_per_device
        r = subprocess.run([sys.executable, "-c", worker, str(n), str(B),
                            args.platform],
                           capture_output=True, text=True, timeout=1800)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            rows.append({"n": n, "error": (r.stderr or r.stdout)[-500:]})
        print(rows[-1], flush=True)
    base = next((r for r in rows if r.get("n") == 1 and "windows_per_s" in r),
                None)
    for r in rows:
        if base and "windows_per_s" in r:
            r["speedup_vs_1dev"] = round(
                r["windows_per_s"] / base["windows_per_s"], 2)
    out = {
        "rows": rows,
        "note": ("virtual CPU mesh shares the host's physical cores "
                 f"(os.cpu_count={os.cpu_count()}); wall-clock scaling is "
                 "bounded by core count — ICI scaling requires real chips"),
        "solver": "structured+schur+gauge, max_iters=12 (production)",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
